package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since the
  * key's previous event exceeds `maxGapMs`. The classic event-pipeline
  * operator (adjacent to the reference's ingestion intervals — same
  * lag/lead-over-entity-time shape, SURVEY §2.5 W2).
  *
  * Plan shape: the lag window, the running-sum window, and the per-session
  * aggregate all share the (key) hash partitioning and (key, ts, tie)
  * ordering, so Catalyst plans ONE exchange and one sort for the whole
  * operator — scale cost is a single shuffle on the entity key.
  *
  * Streaming twin: Spark's built-in `session_window(ts, gap)` aggregation
  * produces the same event→session assignment under watermarking (session
  * membership is identical — chains of events within `gap` merge); this
  * batch form additionally exposes the exact per-session ordinal and
  * first-to-last duration the oracle checks.
  */
object Sessionize {

  /** One row per (key, session): ordinal session id (1-based, in time
    * order), session start, event count, and first-to-last duration in ms.
    */
  def byGap(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
            maxGapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val gapMs = unix_millis(ts) - unix_millis(lag(ts, 1).over(w))
    val tagged = df.withColumn("__new",
      when(gapMs.isNull || gapMs > maxGapMs, 1L).otherwise(0L))
    val sessioned = tagged.withColumn("session_id",
      sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessioned.groupBy(key.as("key"), col("session_id"))
      .agg(
        min(ts).as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_millis(max(ts)) - unix_millis(min(ts))).as("duration_ms"))
  }
}
