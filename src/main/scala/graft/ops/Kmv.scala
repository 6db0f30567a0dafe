package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the classic mergeable
  * cardinality estimator (Bar-Yossef et al., "Counting distinct elements
  * in a data stream"): keep the k smallest *distinct* hash values seen;
  * if fewer than k survive the stream, the count is exact, otherwise
  * `(k-1) * M / h_k` estimates the cardinality (hashes uniform on
  * `[0, M)`, so the k-th minimum sits at ≈ k/n of the range).
  *
  * This is the principled at-scale shape for the reference dashboard's
  * `COUNT(DISTINCT …)` panels (`Dashboard_Live_Final.py:230-233`) when
  * the key set itself no longer fits a per-group hash table: state is
  * O(k) per group, partial aggregation ships ≤ k longs per partition,
  * and two sketches merge losslessly (union of mins, re-capped) — so it
  * runs identically in `groupBy.agg`, incremental batches, and
  * streaming updates. The estimate is *deterministic* for a fixed hash
  * family — the `sk1` gate pins it to an engine-portable SQL oracle,
  * and `sk1b` proves this Aggregator reproduces that oracle bit-exactly.
  */
object Kmv {

  /** Hash-space modulus: 2^31 - 1 (Mersenne prime). */
  val M: Long = 2147483647L

  /** Engine-portable multiplicative hash to `[0, M)` — Knuth's 2^32/φ
    * multiplier; expressible identically in Spark and ANSI SQL
    * (`(x * 2654435761 + 987654321) % 2147483647`).
    */
  def hash(x: Long): Long = (x * 2654435761L + 987654321L) % M

  /** Typed Aggregator keeping the k smallest distinct input values.
    * Buffer invariant: sorted ascending, distinct, size ≤ k. Insert is
    * one binary search + O(k) splice; merge is one linear sorted-distinct
    * merge stopping at k.
    */
  class MinKDistinct(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
      if (b.size >= k && a >= b.last) b
      else {
        var lo = 0
        var hi = b.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (b(mid) < a) lo = mid + 1 else hi = mid
        }
        if (lo < b.size && b(lo) == a) b // already present
        else {
          val ins = (b.take(lo) :+ a) ++ b.drop(lo)
          if (ins.size > k) ins.take(k) else ins
        }
      }
    }

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
      val out = Vector.newBuilder[Long]
      var i = 0
      var j = 0
      var n = 0
      var last = 0L
      var any = false
      while (n < k && (i < b1.size || j < b2.size)) {
        val takeLeft = j >= b2.size || (i < b1.size && b1(i) <= b2(j))
        val v = if (takeLeft) { val x = b1(i); i += 1; x }
                else { val x = b2(j); j += 1; x }
        if (!any || v != last) { out += v; last = v; any = true; n += 1 }
      }
      out.result()
    }

    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }
}
