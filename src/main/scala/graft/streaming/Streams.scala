package graft.streaming

import graft.etl.RedsetSchema
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming topology (SURVEY §2.8, §3.1-3.2), the principled
  * rebuild of the reference's Kafka → DuckDB micro-batch loops:
  *
  *  - ST1/ST2: micro-batch ingestion with exactly-once-to-idempotent-sinks
  *    (checkpointing) replaces poll-until-empty + manual offset commit
  *    (`Dashboard_Live_Final.py:627-706`).
  *  - ST3: the 60 s TRUNCATE cycle becomes an event-time tumbling window.
  *  - ST4/ST8: the hand-rolled MAX(ts) watermark probe
  *    (`Dashboard_Historical_Final.py:190-198`) becomes `withWatermark`,
  *    plus principled late/duplicate handling the reference lacks.
  *  - ST5: the dual-α EWMA stress index (`Dashboard_Live_Final.py:577-624`)
  *    becomes a stateful flatMapGroupsWithState op.
  *  - S4: the 6-topic fan-out (`producer_Final.py:120-129`) becomes one
  *    stream with N projected sinks inside foreachBatch.
  *
  * Scale: state is partitioned by group key across executors; watermark
  * eviction bounds it. Nothing here collects to the driver.
  */
object Streams {

  /** S2 (test form): file-based JSON stream decoding the Redset wire format.
    * Swap `format("json")` for `format("kafka")` + `from_json(col("value"))`
    * against a broker; everything downstream is identical.
    */
  def jsonFileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(RedsetSchema.rawSchema)
      .option("maxFilesPerTrigger", 1)
      .json(dir)

  /** ST3: tumbling event-time aggregate with watermark — counts + sums per
    * window per group. `delay` is the allowed lateness (ST8).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     valCol: String, window: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** SLIDING windows on a stream (the st3b batch twin's streaming side):
    * window(len, slide) fans each event into ceil(len/slide) open windows,
    * the watermark closes them `delay` past their end. slide == len
    * degenerates to [[tumblingCounts]].
    */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    window: String, slide: String, delay: String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window, slide),
        col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** ST8: watermarked streaming dedup by id — the principled upgrade of the
    * reference's DISTINCT-after-the-fact (U2).
    */
  def dedupById(events: DataFrame, tsCol: String, idCol: String,
                delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming windowed HDR quantile sketch (the [[graft.ops.HdrHist]]
    * stream side): per event-time window and key, the mergeable
    * `(bucket, n)` histogram — a plain watermarked groupBy-count, so
    * partial aggregation absorbs the stream and state per (window, key)
    * is O(subBuckets · log range) counters. The quantile READ-OFF stays
    * downstream on the (tiny) emitted sketch — `HdrHist.bucketLow` over a
    * cumulative sum — because rank selection needs the closed window's
    * full histogram; emitting the sketch, not the percentile, is also
    * what lets late windows merge and serving layers re-slice (p50 today,
    * p99 tomorrow) without reprocessing. Batch twin: the
    * `st3c_window_hdr_p99` gate pins window+bucket+count parity.
    */
  def hdrBuckets(events: DataFrame, tsCol: String, keyCol: String,
                 value: org.apache.spark.sql.Column, window: String,
                 delay: String, subBits: Int = 3): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol),
        graft.ops.HdrHist.bucket(value, subBits).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("bucket"), col("n"))

  /** EWMA state per key: the two time constants + last event time. */
  case class EwmaState(shortAvg: Double, longAvg: Double, lastTsMicros: Long)

  /** One emitted stress point (ST5/ST6 shape: short, long, raw). */
  case class StressPoint(key: Long, tsMicros: Long, shortAvg: Double,
                         longAvg: Double, raw: Double)

  /** Input record for the EWMA op. */
  case class MetricEvent(key: Long, tsMicros: Long, value: Double)

  /** ST5: dual-time-constant EWMA (short α=0.02, long α=0.005 — reference
    * constants, `Dashboard_Live_Final.py:596-597`) as a stateful streaming
    * op. Within each micro-batch the group's events are folded in event-time
    * order (the producer pre-sorts, O1; sorting here makes it robust to
    * intra-batch reordering anyway). Emits one point per input event.
    *
    * Batch twin: `w4_ewma_per_user` (strict left fold via `aggregate`);
    * the streaming fold is the same recurrence, so both agree on ordered
    * input — asserted in StreamingSpec.
    */
  def ewmaStress(events: Dataset[MetricEvent],
                 alphaShort: Double = 0.02,
                 alphaLong: Double = 0.005): Dataset[StressPoint] = {
    import events.sparkSession.implicits._
    def fold(key: Long, it: Iterator[MetricEvent],
             state: GroupState[EwmaState]): Iterator[StressPoint] = {
      val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.value))
      var s = state.getOption.getOrElse(
        EwmaState(Double.NaN, Double.NaN, Long.MinValue))
      val out = sorted.map { e =>
        val sh = if (s.shortAvg.isNaN) e.value
                 else alphaShort * e.value + (1 - alphaShort) * s.shortAvg
        val lo = if (s.longAvg.isNaN) e.value
                 else alphaLong * e.value + (1 - alphaLong) * s.longAvg
        s = EwmaState(sh, lo, e.tsMicros)
        StressPoint(key, e.tsMicros, sh, lo, e.value)
      }
      if (sorted.nonEmpty) state.update(s)
      out.iterator
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  case class AsOfEvent(key: Long, tsMicros: Long, side: Int, value: Double)
  case class AsOfMatch(key: Long, tsMicros: Long, value: Double,
                       asofTsMicros: Option[Long], asofValue: Option[Double])
  case class AsOfState(lastTsMicros: Long, lastValue: Double)

  /** Streaming as-of enrichment — the stateful twin of
    * [[graft.ops.AsOf.asOfJoin]]: per key, remember the latest RIGHT
    * observation (side = 0) seen so far and attach it to every LEFT row
    * (side = 1) whose event time is at or after it. Within a micro-batch
    * events fold in (time, side) order — right-before-left at equal
    * timestamps, the same backward-inclusive contract as the batch
    * operator — so batch and stream agree on ordered input (asserted in
    * StreamingSpec). State is O(1) per key (one timestamped value);
    * cross-batch late RIGHT rows older than the remembered one are
    * ignored by construction (max-timestamp-wins), the watermark-free
    * at-arrival semantics every streaming enrichment join degrades to.
    */
  def asOfEnrich(events: Dataset[AsOfEvent]): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    def fold(key: Long, it: Iterator[AsOfEvent],
             state: GroupState[AsOfState]): Iterator[AsOfMatch] = {
      val sorted = it.toSeq.sortBy(e => (e.tsMicros, e.side))
      var s = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfMatch]
      sorted.foreach { e =>
        if (e.side == 0) {
          if (s == null || e.tsMicros >= s.lastTsMicros)
            s = AsOfState(e.tsMicros, e.value)
        } else {
          out += AsOfMatch(key, e.tsMicros, e.value,
            Option(s).map(_.lastTsMicros), Option(s).map(_.lastValue))
        }
      }
      if (s != null) state.update(s)
      out.iterator
    }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** ST6: sliding history buffer — last `n` points per key by event time
    * (the reference's tail(100)/tail(50) chart buffers). Batch twin shown;
    * in streaming this is the memory-sink + client-trim pattern, or this
    * same window inside foreachBatch.
    */
  def lastNPerKey(df: DataFrame, keyCol: String, tsCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc)))
      .filter(col("_rn") <= n).drop("_rn")
  }

  /** S4: one micro-batch fanned out to N projected sinks (the 6-topic
    * multiplex). `sinks` maps sink name → (columns, writer).
    */
  def fanOut(stream: DataFrame,
             sinks: Map[String, (Seq[String], DataFrame => Unit)]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try sinks.foreach { case (_, (cols, write)) =>
        write(batch.select(cols.map(col): _*))
      } finally { batch.unpersist(); () }
    }
}
