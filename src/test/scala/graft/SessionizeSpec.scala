package graft

import graft.ops.Sessionize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap split, ordinals, durations") {
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val df = Seq(
      ("u1", ts(0L), 1L), ("u1", ts(60000L), 2L),        // session 1: 2 events
      ("u1", ts(10000000L), 3L),                          // gap > 1h → session 2
      ("u2", ts(0L), 4L)                                  // own key
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize.byGap(df, col("user_id"), col("ts"), col("event_id"),
        maxGapMs = 3600000L)
      .orderBy("key", "session_id").collect()
    val rows = out.map(r => (r.getString(0), r.getLong(1),
      r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms")))
    assert(rows.toSeq == Seq(
      ("u1", 1L, 2L, 60000L), ("u1", 2L, 1L, 0L), ("u2", 1L, 1L, 0L)))
  }

  test("membership matches the built-in session_window aggregation") {
    // deterministic pseudo-random event times, several keys, 1-minute gap
    val df = (1 to 400).map { i =>
      val user = s"u${i % 7}"
      val t = ((i * 104729) % 10000).toLong * 1000L // 0..10000s, dup-heavy
      (user, new java.sql.Timestamp(t), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val gapped = Sessionize.byGap(df, col("user_id"), col("ts"), col("event_id"),
        maxGapMs = 60000L)
      .groupBy("key").agg(sort_array(collect_list(col("n_events"))).as("sizes"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val builtin = df
      .groupBy(col("user_id"), session_window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(sort_array(collect_list(col("n"))).as("sizes"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(gapped == builtin)
  }

  test("plan: one exchange before the final sort") {
    val df = Seq(("u1", new java.sql.Timestamp(0L), 1L))
      .toDF("user_id", "ts", "event_id")
    val plan = Sessionize.byGap(df, col("user_id"), col("ts"), col("event_id"), 1000L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
