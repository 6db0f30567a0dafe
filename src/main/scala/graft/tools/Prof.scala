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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    t("d6 plain t=0.5 3gram") {
      Dedup.jaccardPairs(docs, col("text"), col("doc_id"), "source", 0.5, 3).count()
    }
    t("d6 prefix t=0.5 3gram") {
      Dedup.jaccardPairsPrefix(docs, col("text"), col("doc_id"), "source", 0.5, 3).count()
    }
    t("d4 plain t=0.9 1gram") {
      Dedup.jaccardPairs(docs, col("text"), col("doc_id"), "source", 0.9, 1).count()
    }
    t("d4 prefix t=0.9 1gram") {
      Dedup.jaccardPairsPrefix(docs, col("text"), col("doc_id"), "source", 0.9, 1).count()
    }
    spark.stop()
  }
}
