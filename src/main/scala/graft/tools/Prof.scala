package graft.tools
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). Currently:
  * stage attribution for the exact keep-one dedup action (d7/d12),
  * including the prefix-candidate substages (the d12 hot path).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    val sig = array_join(array_sort(Dedup.shingles(col("text"), 1)), "")
    val reps = t("rep collapse (ckpt)") {
      docs.withColumn("__rn", row_number().over(Window.partitionBy(sig).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__all", lit(0))
        .localCheckpoint(true)
    }
    println(s"  reps: ${reps.count()}")
    // mirror of jaccardPairsPrefix's internal frame (hashed shingles)
    val sh = Dedup.shingles(col("text"), 1)
    val d = t("shingle-hash ckpt") {
      reps.select(col("__all").as("blk"), col("doc_id"),
          array_sort(transform(sh, x => xxhash64(x))).as("toks"), size(sh).as("n"))
        .localCheckpoint(true)
    }
    val threshold = 0.9
    val prefixLen = (col("n") - ceil(col("n") * threshold) + 1).cast("int")
    val tok = d.select(col("blk"), col("doc_id"), col("n"), explode(col("toks")).as("p"))
    t("tok explode count")(println(s"  tok rows: ${tok.count()}"))
    val freq = tok.groupBy(col("p")).agg(count(lit(1)).as("__df"))
    t("freq agg count")(println(s"  vocab: ${freq.count()}"))
    val pre = t("prefix rows (join+window, ckpt)") {
      tok.join(freq, Seq("p"))
        .withColumn("i", row_number().over(
          Window.partitionBy(col("blk"), col("doc_id")).orderBy(col("__df"), col("p"))))
        .filter(col("i") <= prefixLen)
        .localCheckpoint(true)
    }
    println(s"  prefix rows: ${pre.count()}")
    val a = pre.select(col("blk"), col("p"), col("doc_id").as("doc_a"),
      col("i").as("i_a"), col("n").as("pn_a"))
    val b = pre.select(col("blk"), col("p"), col("doc_id").as("doc_b"),
      col("i").as("i_b"), col("n").as("pn_b"))
    val alpha = ceil(lit(threshold / (1 + threshold)) * (col("pn_a") + col("pn_b")))
    val sizeOk = least(col("pn_a"), col("pn_b")).cast("double") >=
      greatest(col("pn_a"), col("pn_b")) * threshold
    val joined = a.join(b, Seq("blk", "p"))
      .where(col("doc_a") < col("doc_b") && sizeOk &&
        (lit(1) + least(col("pn_a") - col("i_a"), col("pn_b") - col("i_b"))) >= alpha)
    t("instance join count")(println(s"  instances: ${joined.count()}"))
    t("distinct pairs count")(
      println(s"  candidates: ${joined.select(col("doc_a"), col("doc_b")).distinct().count()}"))
    val nCand = t("prefixCandidates (lib)") {
      Dedup.prefixCandidates(d, threshold).count()
    }
    println(s"  candidates: $nCand")
    val edges = t("jaccardPairsPrefix full") {
      Dedup.jaccardPairsPrefix(reps, col("text"), col("doc_id"), "__all", threshold)
    }
    println(s"  edges: ${edges.count()}")
    val labels = t("components") { Dedup.components(edges) }
    println(s"  nodes: ${labels.count()}")
    val kept = t("keep-one anti join + count") {
      Dedup.keepOnePerComponent(reps, col("doc_id"), edges).count()
    }
    println(s"  kept: $kept")
    spark.stop()
  }
}
