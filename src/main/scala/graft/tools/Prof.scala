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
    // per-round attribution of the components loop (mirror of Dedup.components)
    locally {
      import org.apache.spark.sql.graftbridge.Bridge
      val sym = t("cc sym ckpt") {
        edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
          .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
          .localCheckpoint(true)
      }
      var lab = t("cc init") {
        sym.groupBy(col("v")).agg(min(col("u")).as("__mn"))
          .select(col("v").as("node"), least(col("v"), col("__mn")).as("comp"))
          .localCheckpoint(true)
      }
      var i = 0
      var done = false
      while (!done && i < 20) {
        val nextFull = t(s"cc round $i ckpt") {
          val prop = sym.join(lab, sym("u") === lab("node"))
            .groupBy(col("v").as("p_node")).agg(min(col("comp")).as("neighbor_min"))
          val stepped = lab.join(prop, lab("node") === prop("p_node"), "left")
            .select(col("node"), col("comp").as("prev"),
              least(col("comp"), coalesce(col("neighbor_min"), col("comp"))).as("comp"))
          val lut = stepped.select(col("node").as("c_node"), col("comp").as("c_comp"))
          stepped.join(lut, stepped("comp") === lut("c_node"), "left")
            .select(col("node"), col("prev"),
              least(col("comp"), coalesce(col("c_comp"), col("comp"))).as("comp"))
            .localCheckpoint(true)
        }
        val changed = t(s"cc round $i probe") {
          nextFull.filter(col("comp") =!= col("prev")).limit(1).count()
        }
        Bridge.release(lab)
        lab = nextFull
        done = changed == 0
        i += 1
      }
      Bridge.release(sym); Bridge.release(lab)
    }
    val kept = t("keep-one anti join + count") {
      Dedup.keepOnePerComponent(reps, col("doc_id"), edges).count()
    }
    println(s"  kept: $kept")
    // WARM per-stage attribution of the exact d12 path (3 reps, min): the
    // bench is min-of-3 warm, so cold single-shot numbers above mislead.
    for (rep <- 0 until 3) {
      import org.apache.spark.sql.graftbridge.Bridge
      def tw[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"WARM$rep $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // mirror of the PRODUCTION rep collapse (groupBy + min_by, \u0001
      // separator) -- keep in sync with nearDupClusterHistogram
      val sig12 = array_join(array_sort(Dedup.shingles(col("text"), 1)), "\u0001")
      val reps12 = tw("d12 rep collapse ckpt") {
        docs.groupBy(sig12.as("__sig"))
          .agg(min_by(struct(docs.columns.toIndexedSeq.map(col): _*),
            col("doc_id")).as("__rep"),
            count(lit(1)).as("__dups"))
          .select(col("__rep.*"), col("__dups"))
          .withColumn("__all", lit(0))
          .localCheckpoint(true)
      }
      val e12 = tw("d12 ppjoin") {
        Dedup.jaccardPairsPrefix(reps12, col("text"), col("doc_id"), "__all", 0.9)
      }
      val l12 = tw("d12 components") { Dedup.components(e12) }
      tw("d12 hist") {
        reps12.join(l12, col("doc_id") === l12("node"), "left")
          .select(coalesce(col("comp"), col("doc_id")).as("__comp"), col("__dups"))
          .groupBy(col("__comp")).agg(sum(col("__dups")).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
          .count()
      }
      Bridge.release(l12); Bridge.release(reps12); Bridge.release(e12)
    }
    spark.stop()
  }
}
