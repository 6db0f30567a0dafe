package graft.tools
import graft.pipeline.RedsetPipeline
import graft.queries.RedsetFixture
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). Currently:
  * cost of the inc-gate variants — checkpointed vs recomputed micro-batches.
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
    val rawDf = RedsetFixture.raw(spark, dir)
    rawDf.count()
    val evenL = rawDf.filter(pmod(col("query_id").try_cast("long"), lit(2)) === 0)
    val oddL = rawDf.filter(pmod(col("query_id").try_cast("long"), lit(2)) === 1)
    val even = t("ckpt even")(evenL.localCheckpoint(true))
    val odd = t("ckpt odd")(oddL.localCheckpoint(true))
    val base1 = graft.queries.QDef.tempDir("graft_prof1")
    Seq(0L -> even, 1L -> odd, 1L -> odd).zipWithIndex.foreach { case ((id, b), i) =>
      t(s"ckpt inc batch $i") {
        RedsetPipeline.incrementalBatch(b, id, s"$base1/staged", s"$base1/out", nBuckets = 16)
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.release(even)
    org.apache.spark.sql.graftbridge.Bridge.release(odd)
    val base2 = graft.queries.QDef.tempDir("graft_prof2")
    Seq(0L -> evenL, 1L -> oddL, 1L -> oddL).zipWithIndex.foreach { case ((id, b), i) =>
      t(s"lazy inc batch $i") {
        RedsetPipeline.incrementalBatch(b, id, s"$base2/staged", s"$base2/out", nBuckets = 16)
      }
    }
    spark.stop()
  }
}
