package graft.ops

import graft.fns.Fns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Historical "Expert View" core (SURVEY §3.3): ingestion intervals and the
  * interval join, generic over the entity keys so the same operators serve
  * the Redset shape (`instance_id`,`write_table_id`) and any analog.
  *
  * Design deviations from the reference, on purpose (SURVEY §7.1):
  *  - J1/J2 (self inequality join + correlated MIN subquery,
  *    `Dashboard_Historical_Final.py:216-238`, `update_tables.py:45-78`) are
  *    replaced by `lead()` over a window — O(n log n) shuffle-sort per key
  *    instead of an O(n²) self-join; identical "next ingestion" semantics.
  *  - J8 (`UPDATE .. FROM` backfill, `update_tables.py:82-109`) becomes a
  *    stateless recompute from source — no in-place mutation in Spark; at
  *    scale this is an incremental window over (old ∪ new) partitions.
  *
  * Scale: both operators shuffle once on the entity key; the window sort and
  * the join co-partition on the same key, so with pre-bucketed storage the
  * exchange disappears entirely. Skewed hot keys are the known risk (SURVEY
  * §7.3 hard part #2) — AQE skew-join handles the join side; the window is
  * per-key sequential by nature.
  */
object Intervals {

  /** W2/J2: for each ingest event, the timestamp of the *next* ingest of the
    * same entity → half-open ingestion intervals
    * `(keys…, idCol, current_ts, next_ts)`; the latest interval per entity
    * has `next_ts = null` (open).
    *
    * `orderTieBreak` makes the sort total so results are deterministic under
    * equal timestamps (the reference relies on arrival order being unique).
    */
  def ingestionIntervals(
      ingests: DataFrame,
      keys: Seq[String],
      tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    ingests.select((keys :+ idCol :+ tsCol).map(col): _*)
      .withColumnRenamed(tsCol, "current_ts")
      .withColumn("next_ts",
        lead(col("current_ts"), 1).over(
          Window.partitionBy(keys.map(col): _*)
            .orderBy(col("current_ts"), col(idCol))))
  }

  /** [[ingestionIntervals]]'s SCALE twin (j2b): identical intervals, but
    * no per-key corpus window — a mega entity (one instance producing
    * half the events) no longer funnels its whole history into one
    * task. Events bucket by time (`unix_millis(ts) div width`, monotone
    * in the sort order since ties on ts share a bucket; NULL timestamps
    * land in a `Long.MinValue` sentinel bucket, matching the window
    * form's nulls-first order — parity holds on NULL inputs too); the
    * lead runs per `(key, bucket)`, and each bucket's LAST row takes
    * its successor from the CARRY — the next non-empty bucket's first
    * event, computed per key on the REDUCED `(key, bucket, first)`
    * frame and joined back. The carry join is a PLAIN equi-join on
    * `(keys, bucket)`, deliberately unhinted: the carry frame is one
    * row per non-empty (key, time-bucket) — corpus-bounded, not
    * key-bounded — so a forced broadcast could OOM the driver at
    * exactly the high-cardinality-key scale this twin exists for,
    * while the shuffle it avoids is free anyway (the join keys equal
    * the in-bucket lead window's partition keys, so Catalyst reuses
    * ONE corpus-side exchange for both; AQE may still elect a
    * broadcast when stats say the carry side is genuinely small). The
    * last event overall carries NULL (the open interval), exactly the
    * window form.
    */
  def ingestionIntervalsScalable(
      ingests: DataFrame,
      keys: Seq[String],
      tsCol: String,
      idCol: String,
      bucketWidthMs: Long = 3600000L): DataFrame = {
    require(bucketWidthMs >= 1, s"bucketWidthMs must be >= 1: $bucketWidthMs")
    val kcols = keys.map(col)
    val base = ingests.select((keys :+ idCol :+ tsCol).map(col): _*)
      .withColumnRenamed(tsCol, "current_ts")
      .withColumn("__b", coalesce(
        expr(s"unix_millis(current_ts) div $bucketWidthMs"),
        lit(Long.MinValue)))
    val carries = base
      .groupBy((kcols :+ col("__b")): _*)
      .agg(min(struct(col("current_ts"), col(idCol))).as("__f"))
      .withColumn("__carry",
        lead(col("__f").getField("current_ts"), 1).over(
          Window.partitionBy(kcols: _*).orderBy(col("__b"))))
      .select((kcols :+ col("__b") :+ col("__carry")): _*)
    // lead a STRUCT so "no next row in bucket" (null struct → carry)
    // stays distinct from "next row has NULL ts" (non-null struct with
    // a null field → NULL, the window form's answer)
    val nxt = lead(struct(col("current_ts")), 1).over(
      Window.partitionBy((kcols :+ col("__b")): _*)
        .orderBy(col("current_ts"), col(idCol)))
    base
      .join(carries, keys :+ "__b", "left")
      .withColumn("__nx", nxt)
      .withColumn("next_ts", when(col("__nx").isNull, col("__carry"))
        .otherwise(col("__nx").getField("current_ts")))
      .drop("__b", "__carry", "__nx")
      .select((keys :+ idCol).map(col) :+ col("current_ts") :+
        col("next_ts"): _*)
  }

  /** J4 + X1/X2: match every probe row to the ingestion interval containing
    * it: `probe.ts ∈ [current_ts, coalesce(next_ts, sentinel))` on the same
    * entity keys. Equi-keys make this a hash/sort-merge join with a range
    * residual (exactly how DuckDB executes the reference's BETWEEN join);
    * emits the reference's derived columns `time_since_last_ingest_ms` /
    * `time_to_next_ingest_ms` (Dashboard_Historical_Final.py:281-308).
    *
    * Inclusive upper bound matches the reference's SQL `BETWEEN`. The open
    * interval (no next ingest) is matched via the 2999 sentinel *inside the
    * join condition only*; the emitted `interval_end` and
    * `time_to_next_ingest_ms` are NULL for open intervals — the sentinel
    * never reaches output (it exceeds the datetime64[ns] range of common
    * consumers, and "no next ingest" is semantically NULL, not year 2999).
    */
  def intervalJoin(
      probes: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    val iv = intervals
      .withColumnRenamed("current_ts", "last_ingest_ts")
      .withColumnRenamed("next_ts", "interval_end")
      .withColumn("_iv_end", coalesce(col("interval_end"), Fns.openIntervalSentinel))
    val ivKeys = keys.map(k => iv(k).as(s"iv_$k"))
    val ivSel = iv.select(ivKeys ++ Seq(iv("last_ingest_ts"), iv("interval_end"),
      iv("_iv_end")): _*)
    val cond = keys.map(k => probes(k) === ivSel(s"iv_$k"))
      .reduce(_ && _) &&
      probes(tsCol) >= ivSel("last_ingest_ts") &&
      probes(tsCol) <= ivSel("_iv_end")
    probes.join(ivSel, cond, "inner")
      .drop(keys.map(k => s"iv_$k") :+ "_iv_end": _*)
      .withColumn("time_since_last_ingest_ms",
        Fns.epochMsBetween(col("last_ingest_ts"), col(tsCol)))
      .withColumn("time_to_next_ingest_ms",
        Fns.epochMsBetween(col(tsCol), col("interval_end")))
  }

  /** Scale variant of [[intervalJoin]] for skewed/hot entity keys (SURVEY
    * §7.3 hard part #2): both sides gain a coarse time bucket that becomes
    * part of the equi-join key, so one hot (instance, table) no longer
    * lands on one shuffle partition — it spreads over its time range.
    *
    * Each interval is exploded into every bucket it spans (open intervals
    * are capped at the probes' max event time first — they'd otherwise span
    * to the 2999 sentinel); each probe has exactly one bucket, so no
    * duplicate matches arise. Semantics are identical to [[intervalJoin]]
    * (asserted in IntervalsSpec); the fan-out cost is
    * span/bucketLen extra interval rows, so pick bucketLen ≈ median
    * inter-ingest gap.
    */
  def intervalJoinBucketed(
      probes: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      tsCol: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    val b = lit(bucketSeconds)
    val maxTs = probes.agg(max(col(tsCol)).as("_max_ts"))
    val iv = intervals
      .withColumnRenamed("current_ts", "last_ingest_ts")
      .withColumnRenamed("next_ts", "interval_end")
      .withColumn("_iv_end", coalesce(col("interval_end"), Fns.openIntervalSentinel))
      .crossJoin(broadcast(maxTs))
      .withColumn("_end_capped",
        least(col("_iv_end"), greatest(col("_max_ts"), col("last_ingest_ts"))))
      .withColumn("bucket",
        explode(sequence(floor(unix_timestamp(col("last_ingest_ts")) / b),
          floor(unix_timestamp(col("_end_capped")) / b))))
      .drop("_max_ts", "_end_capped")
    val ivKeys = keys.map(k => iv(k).as(s"iv_$k"))
    val ivSel = iv.select(ivKeys ++ Seq(iv("bucket"),
      iv("last_ingest_ts"), iv("interval_end"), iv("_iv_end")): _*)
    val probesB = probes.withColumn("_p_bucket",
      floor(unix_timestamp(col(tsCol)) / b))
    val cond = keys.map(k => probesB(k) === ivSel(s"iv_$k")).reduce(_ && _) &&
      probesB("_p_bucket") === ivSel("bucket") &&
      probesB(tsCol) >= ivSel("last_ingest_ts") &&
      probesB(tsCol) <= ivSel("_iv_end")
    probesB.join(ivSel, cond, "inner")
      .drop(keys.map(k => s"iv_$k") :+ "_p_bucket" :+ "bucket" :+ "_iv_end": _*)
      .withColumn("time_since_last_ingest_ms",
        Fns.epochMsBetween(col("last_ingest_ts"), col(tsCol)))
      .withColumn("time_to_next_ingest_ms",
        Fns.epochMsBetween(col(tsCol), col("interval_end")))
  }

  /** Interval OVERLAP join (interval × interval, the shape neither J4
    * nor J9 covers): all same-key pairs whose spans intersect, with the
    * overlap duration. Left intervals are half-open `[lStart, lEnd)`
    * with `lEnd` NULL = open (the J2 ingestion-interval contract); right
    * intervals are closed `[rStart, rEnd]` (the w5 session contract).
    * Overlap iff `lStart <= rEnd AND rStart < lEnd'` (sentinel-closed),
    * duration `min(lEnd', rEnd) − max(lStart, rStart)` — 0 for boundary
    * touches and point intervals.
    *
    * Scale path: both sides explode into coarse time buckets that join
    * as an equi-key (the intervalJoinBucketed strategy) — but with
    * intervals on BOTH sides a pair would match once per shared bucket,
    * so the join keeps only the DESIGNATED bucket: the one containing
    * the overlap start `max(lStart, rStart)`. That bucket is provably
    * covered by both explode ranges whenever the pair overlaps, so each
    * overlapping pair survives exactly once — no distinct/dedup shuffle
    * afterward. Open left ends are capped at the right side's max end
    * before exploding (they'd otherwise fan out to the 2999 sentinel).
    * Fan-out cost is span/bucketLen rows per interval: pick
    * `bucketSeconds` near the median interval length.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    val b = lit(bucketSeconds)
    val maxRe = right.agg(max(col(rEnd)).as("_max_re"))
    val lb = left
      .crossJoin(broadcast(maxRe))
      .withColumn("_l_end", coalesce(col(lEnd), Fns.openIntervalSentinel))
      .withColumn("_l_cap",
        least(col("_l_end"), greatest(col("_max_re"), col(lStart))))
      .withColumn("_bucket",
        explode(sequence(floor(unix_timestamp(col(lStart)) / b),
          floor(unix_timestamp(col("_l_cap")) / b))))
      .drop("_max_re", "_l_cap")
    val rKeys = keys.map(k => s"ov_$k")
    val rb = right
      .toDF(right.columns.toIndexedSeq.map(c => if (keys.contains(c)) s"ov_$c" else c): _*)
      .withColumn("_r_bucket",
        explode(sequence(floor(unix_timestamp(col(rStart)) / b),
          floor(unix_timestamp(col(rEnd)) / b))))
    val cond = keys.map(k => lb(k) === rb(s"ov_$k")).reduce(_ && _) &&
      lb("_bucket") === rb("_r_bucket") &&
      lb(lStart) <= rb(rEnd) && rb(rStart) < lb("_l_end") &&
      lb("_bucket") ===
        floor(unix_timestamp(greatest(lb(lStart), rb(rStart))) / b)
    lb.join(rb, cond, "inner")
      .withColumn("overlap_ms",
        Fns.epochMsBetween(greatest(col(lStart), col(rStart)),
          least(col("_l_end"), col(rEnd))))
      .drop(rKeys :+ "_bucket" :+ "_r_bucket" :+ "_l_end": _*)
  }
}
