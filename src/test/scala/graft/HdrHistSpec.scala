package graft

import graft.ops.HdrHist
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HdrHistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucket is monotone, exact under 2^subBits, and bucketLow inverts to the bucket floor") {
    val vs = (0L until 4096L) ++ Seq(1L << 40, (1L << 40) + 12345L, Long.MaxValue / 2)
    val df = vs.toDF("v")
      .select(col("v"), HdrHist.bucket(col("v"), 3).as("b"))
      .select(col("v"), col("b"), HdrHist.bucketLow(col("b"), 3).as("low"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact identity below 8
    rows.filter(_._1 < 8).foreach { case (v, b, low) =>
      assert(b == v && low == v)
    }
    // monotone in v, and low <= v < low * (1 + 2^-3) + 1
    rows.sortBy(_._1).sliding(2).foreach {
      case Array((v1, b1, _), (v2, b2, _)) if v1 < v2 => assert(b1 <= b2)
      case _ =>
    }
    rows.filter(_._1 >= 8).foreach { case (v, _, low) =>
      assert(low <= v, s"low $low > v $v")
      assert(v - low <= low / 8, s"v $v above bucket [$low, ${low + low / 8}]")
    }
  }

  test("histogram merges by adding counts (union of halves == whole)") {
    val vs = (1L to 1000L).map(i => (i % 7, i * i % 9973))
    val df = vs.toDF("k", "v")
    val whole = HdrHist.histogram(df, col("v"), Seq("k"))
      .orderBy("k", "bucket").collect().toSeq
    val merged = HdrHist.histogram(df.filter(col("v") % 2 === 0), col("v"), Seq("k"))
      .unionByName(HdrHist.histogram(df.filter(col("v") % 2 === 1), col("v"), Seq("k")))
      .groupBy("k", "bucket").agg(sum("n").as("n"))
      .orderBy("k", "bucket").collect().toSeq
    assert(merged.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      whole.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("quantile estimates land within the sketch's relative-error bound of the exact percentile") {
    val vs = (1L to 10000L).map(i => ("g", (i * 2654435761L) % 100000L + 1))
    val df = vs.toDF("k", "v")
    val qs = HdrHist.quantiles(df, col("v"), Seq("k"), Seq(500, 900, 990))
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.9, 0.99), 0.0)
    Seq(500 -> exact(0), 900 -> exact(1), 990 -> exact(2)).foreach {
      case (q, ex) =>
        val est = qs(q).toDouble
        // est is the bucket's lower bound; the true value sits within one
        // bucket width (<= est/8) above it, modulo rank-vs-value discreteness
        assert(est <= ex * 1.01 && ex <= est * 1.14 + 8,
          s"q=$q est=$est exact=$ex")
    }
  }
}
