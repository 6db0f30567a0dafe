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
    docs.count() // warm
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }
    t("signature only") {
      val sh = array_distinct(split(col("text"), " "))
      val tok = docs.select(col("doc_id"), explode(sh).as("tk"))
        .withColumn("th", pmod(xxhash64(col("tk")), lit(2038074743L)))
      val cols = (0 until 16).map(i =>
        min(pmod(lit(1234567L + i) * col("th") + i, lit(2038074743L))).as(s"h$i"))
      tok.groupBy(col("doc_id")).agg(cols.head, cols.tail: _*).count()
    }
    t("full candidates") {
      Dedup.minHashLshCandidates(docs, col("text"), col("doc_id"), 16, 4).count()
    }
    t("full candidates again") {
      Dedup.minHashLshCandidates(docs, col("text"), col("doc_id"), 16, 4).count()
    }
    spark.stop()
  }
}
