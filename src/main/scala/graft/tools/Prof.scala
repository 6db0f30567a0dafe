package graft.tools
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). Currently:
  * stage attribution for the exact keep-one dedup action (d7).
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
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    val sig = array_join(array_sort(Dedup.shingles(col("text"), 1)), "")
    val reps = t("rep collapse (ckpt)") {
      docs.withColumn("__rn", row_number().over(Window.partitionBy(sig).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__all", lit(0))
        .localCheckpoint(true)
    }
    println(s"  reps: ${reps.count()}")
    val sh = Dedup.shingles(col("text"), 1)
    val d = t("shingle ckpt") {
      reps.select(col("__all").as("blk"), col("doc_id"), sh.as("toks"), size(sh).as("n"))
        .localCheckpoint(true)
    }
    val nCand = t("prefix candidates count") {
      Dedup.prefixCandidates(d, 0.9).count()
    }
    println(s"  candidates: $nCand")
    val edges = t("jaccardPairsPrefix full") {
      Dedup.jaccardPairsPrefix(reps, col("text"), col("doc_id"), "__all", 0.9)
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
