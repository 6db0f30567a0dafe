package graft

import graft.ops.Kmv

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kmv.MinKDistinct buffer invariants (sorted ascending, distinct,
  * size ≤ k) must hold under arbitrary reduce/merge interleavings —
  * that is what makes the sketch safe under Spark's partial-aggregation
  * plan, where partition-local buffers merge in a non-deterministic
  * order. Also pins the estimator's exact-below-k contract and its
  * bit-agreement with a brute-force sort-take-k reference.
  */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val agg = new Kmv.MinKDistinct(8)

  private def bruteMinK(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce keeps the k smallest distinct values, sorted") {
    val xs = Seq(42L, 7L, 42L, 99L, 1L, 7L, 55L, 3L, 88L, 12L, 5L, 100L, 2L)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf == bruteMinK(xs, 8))
    assert(buf == buf.sorted && buf == buf.distinct && buf.size <= 8)
  }

  test("merge of split streams equals reduce of the concatenation") {
    val xs = (1 to 200).map(i => ((i * 7919) % 61).toLong)
    for (cut <- Seq(0, 1, 50, 199, 200)) {
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == bruteMinK(xs, 8), s"cut=$cut")
      // commutativity — merge order must not matter
      assert(merged == agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce)))
    }
  }

  test("below-k cardinality is tracked exactly") {
    val xs = Seq(5L, 3L, 5L, 9L, 3L)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(3L, 5L, 9L)) // 3 distinct < k=8 → all retained
  }

  test("distributed agg over scrambled partitions matches local fold") {
    val xs = (1 to 5000).map(i => Kmv.hash(((i * 104729) % 700).toLong))
    val minK = udaf(new Kmv.MinKDistinct(64))
    val fromSpark = xs.toDF("v").repartition(13)
      .agg(minK(col("v")).as("mins")).select(col("mins"))
      .as[Seq[Long]].head()
    assert(fromSpark == bruteMinK(xs, 64))
  }

  test("estimator is within 15% on a 10k-cardinality stream (k=256)") {
    val k = 256
    val n = 10000
    val bigAgg = new Kmv.MinKDistinct(k)
    val mins = (1 to n).map(i => Kmv.hash(i.toLong))
      .foldLeft(bigAgg.zero)(bigAgg.reduce)
    assert(mins.size == k)
    val est = (k - 1).toLong * Kmv.M / mins.last
    assert(math.abs(est - n).toDouble / n < 0.15, s"est=$est")
  }
}
