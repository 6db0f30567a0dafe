package graft.tools
import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    t("d7 full") {
      val edges = Dedup.minHashLshEdges(docs, col("text"), col("doc_id"), 16, 4)
      val verified = Dedup.verifyJaccard(docs, col("text"), col("doc_id"), edges, 0.9)
      Dedup.keepOnePerComponent(docs, col("doc_id"), verified).count()
    }
    spark.stop()
  }
}
