package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (the time-series "last observation carried forward" join):
  * attach to each left row the latest right row of the same key with
  * `rightTime <= leftTime`. The operator Spark famously lacks as a
  * built-in (pandas `merge_asof`, DuckDB/QuestDB `ASOF JOIN`).
  *
  * Implementation is the scale-correct union trick, NOT an inequality
  * join: tag both sides, union, one window sorted by (time, side) per
  * key, `last(right_payload, ignoreNulls)` over the unbounded-preceding
  * frame, keep left rows. A right row at exactly `leftTime` matches
  * (sides order right-before-left at equal timestamps) — the standard
  * backward-inclusive contract.
  *
  * Scale: ONE shuffle on the key and one sort — O((n+m) log) per key —
  * where the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax
  * formulation materializes O(n·m) candidate rows per key before
  * pruning (a BroadcastNestedLoop or a per-key quadratic blowup at
  * corpus scale). The window is per-key sequential; a pathologically
  * hot key is the same skew case as every keyed window here (salt by
  * coarse time bucket, then a second pass across bucket boundaries).
  *
  * Determinism contract: right rows must be unique per
  * `(key, rightTime)` — pre-aggregate duplicates (the gate does
  * `max(...)`); with intra-key timestamp ties on the RIGHT side the
  * carried payload would otherwise be sort-order-dependent.
  */
object AsOf {

  /** @param rightCols right payload columns carried onto matched left
    *                   rows as `asof_<name>` (plus `asof_ts`, the matched
    *                   right timestamp); all NULL when no right row
    *                   precedes the left row.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(
      (col(rightTime).as("__rts") +: rightCols.map(c => col(c).as(c))): _*)
    val rTagged = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      payload.as("__r"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("__l"))
    val lTagged = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(rTagged.schema("__r").dataType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = leftCols.map(c => col("__l").getField(c).as(c)) ++
      (col("__m").getField("__rts").as("asof_ts") +:
        rightCols.map(c => col("__m").getField(c).as(s"asof_$c")))
    matched.select(out: _*)
  }

  /** Backward as-of within a tolerance: like [[asOfJoin]] but a match
    * older than `toleranceExpr` (e.g. `expr("INTERVAL 1 HOUR")`) is
    * discarded — the sensor-reading shape ("the last heartbeat, unless
    * it's stale"). Same single-shuffle plan; the tolerance is a post-hoc
    * null-out, not a join predicate.
    */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTime: String, rightTime: String,
                        rightCols: Seq[String],
                        toleranceExpr: Column): DataFrame = {
    val joined = asOfJoin(left, right, key, leftTime, rightTime, rightCols)
    val fresh = col("asof_ts").isNotNull &&
      col("asof_ts") >= col(leftTime) - toleranceExpr
    val nulled = (Seq("asof_ts") ++ rightCols.map(c => s"asof_$c"))
      .foldLeft(joined) { (d, c) =>
        d.withColumn(c, when(fresh, col(c)).otherwise(lit(null)))
      }
    nulled
  }
}
