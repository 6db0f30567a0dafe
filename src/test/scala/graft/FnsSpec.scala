package graft

import graft.fns.Fns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmss formats milliseconds as m:ss (X5)") {
    val got = Seq(0L, 59000L, 60000L, 61000L, 3599999L, 125000L).toDF("ms")
      .select(Fns.mmss(col("ms"))).as[String].collect().toSeq
    assert(got == Seq("0:00", "0:59", "1:00", "1:01", "59:59", "2:05"))
  }

  test("tokenCount splits words, numbers, and punctuation (BPE-ish)") {
    val got = Seq(
      "hello, world!",        // hello , world ! -> 4
      "a b c",                // 3
      "x1;y2",                // x1 ; y2 -> 3
      "...",                  // . . . -> 3
      "plain"                 // 1
    ).toDF("text")
      .transform(d => graft.text.TextAnalysis.tokenCount(d,
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.monotonically_increasing_id()))
      .select("n_tokens_bpe").as[Long].collect().toSeq
    assert(got == Seq(4L, 3L, 3L, 3L, 1L))
  }

  test("rollingHash matches the reference fold (base 31 mod 1e9+7)") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val inputs = Seq("", "a", "hello world", "the quick brown fox")
    val got = inputs.toDF("t").select(Fns.rollingHash(col("t"))).as[Long].collect()
    // note: split("") on empty string yields one empty token; ascii("") = 0 -> hash 0
    assert(got.toSeq == inputs.map(ref))
  }

  test("cosineSim on known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
    val got = df.select(Fns.cosineSim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("epochMsBetween is exact over a seeded sample") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(50)((rnd.nextLong(100000000L), rnd.nextLong(100000000L)))
    val df = cases.map { case (a, b) =>
      (new java.sql.Timestamp(a), new java.sql.Timestamp(b))
    }.toDF("t1", "t2")
    val got = df.select(Fns.epochMsBetween(col("t1"), col("t2"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => b - a })
  }

  test("bin3 respects inclusive-lower bounds (X11)") {
    val got = Seq(49.99, 50.0, 149.99, 150.0).toDF("v")
      .select(Fns.bin3(col("v"), 50, 150, ("s", "m", "l"))).as[String].collect()
    assert(got.toSeq == Seq("s", "m", "m", "l"))
  }
}
