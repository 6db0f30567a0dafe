package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** HDR-histogram-style log-linear quantile sketch (the mergeable quantile
  * summary next to the KMV/CMS/Bloom/AMS family in `ops/Kmv.scala` etc.):
  * positive longs bucket into octaves (floor(log2)) refined by `2^subBits`
  * linear sub-buckets, so the sketch is O(subBuckets · log range) integers
  * per group REGARDLESS of row count, merges by adding counts (map-side
  * combine absorbs everything — the shuffle moves one bounded histogram
  * per group), and any quantile reads off the cumulative histogram with
  * relative error ≤ 2^-subBits.
  *
  * Everything is EXACT INTEGER arithmetic — msb via the binary-string
  * length (`bin`/`printf('%b')`), dynamic shifts, integer DIV — no log()
  * or pow() anywhere, so Spark and an engine-portable SQL twin agree
  * bit-for-bit on every bucket id and bound (no libm knife-edges; the
  * `sk6` gate hash-checks exactly that). Public-knowledge design (Gil
  * Tene's HdrHistogram bucketing; DDSketch is the log-gamma analog).
  *
  * Values must be >= 0 (buckets 0..2^subBits−1 store 0..2^subBits−1
  * exactly); scale doubles to integer units upstream (e.g. cents). NULL
  * values land in a NULL bucket — filter upstream if that is not wanted.
  */
object HdrHist {

  private def shr(x: Column, n: Column): Column =
    Bridge.column(ShiftRight(Bridge.expression(x), Bridge.expression(n)))
  private def shl(x: Column, n: Column): Column =
    Bridge.column(ShiftLeft(Bridge.expression(x), Bridge.expression(n)))

  /** Bucket id for a non-negative long value. Monotone in `v`:
    * values < 2^subBits map to themselves (exact); otherwise
    * `bucket = shift·2^subBits + (v >> shift)` where
    * `shift = floor(log2 v) − subBits` — the mantissa's top subBits+1
    * bits land the value in one of 2^subBits equal sub-buckets of its
    * octave. (The shifted mantissa lies in [2^subBits, 2^(subBits+1)), so
    * consecutive octaves tile the bucket space without gaps.)
    */
  def bucket(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 16, s"subBits in [1,16]: $subBits")
    val b = 1L << subBits
    val msb = (length(bin(v)) - 1).cast("int") // floor(log2 v) for v >= 1
    val shift = msb - subBits
    when(v < b, v).otherwise(shift.cast("long") * b + shr(v, shift))
  }

  /** Inclusive lower bound of a bucket id — the deterministic quantile
    * estimate (everything in the bucket is within `2^-subBits` above it).
    */
  def bucketLow(bucketId: Column, subBits: Int): Column = {
    val b = 1L << subBits
    val shift = (shr(bucketId, lit(subBits)) - 1).cast("int")
    val mant = bucketId - shift.cast("long") * b
    when(bucketId < b, bucketId).otherwise(shl(mant, shift))
  }

  /** The mergeable sketch itself: one `(key..., bucket, n)` row per
    * non-empty bucket per group — O(subBuckets · log range) rows per key.
    * Union two sketches and re-sum `n` to merge (counts add).
    */
  def histogram(df: DataFrame, value: Column, keys: Seq[String],
                subBits: Int = 3): DataFrame =
    df.groupBy(keys.map(col) :+ bucket(value, subBits).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** Quantile read-off: for each `qPermille` (e.g. 500, 900, 990) the
    * smallest bucket whose cumulative count reaches rank
    * ceil(q · total / 1000), reported as the bucket's lower bound. Two
    * keyed shuffles (histogram, cumulative window over the bounded
    * per-key histogram) however large the input; the quantile probe rows
    * are a bounded explode of the histogram, not a per-row join. Rank
    * arithmetic is exact integer (no double division).
    */
  def quantiles(df: DataFrame, value: Column, keys: Seq[String],
                qPermille: Seq[Int], subBits: Int = 3): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q > 0 && q <= 1000),
      s"quantiles in (0, 1000] permille: $qPermille")
    val hist = histogram(df, value, keys, subBits)
    val w = Window.partitionBy(keys.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(w.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__total", sum(col("n")).over(w))
    val probes = cum
      .withColumn("q", explode(array(qPermille.map(lit): _*)))
      .withColumn("__rank",
        expr("(__total * q + 999) div 1000").cast("long"))
      .filter(col("__cum") >= col("__rank") &&
        col("__cum") - col("n") < col("__rank"))
    probes.select(
      keys.map(col) ++ Seq(col("q"), col("bucket"),
        bucketLow(col("bucket"), subBits).as("est_low"),
        col("__total").as("n_rows")): _*)
  }
}
