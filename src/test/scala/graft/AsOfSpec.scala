package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 11:00:00")),
    (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
    (4L, 20L, ts("2024-01-01 10:30:00"))
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (10L, ts("2024-01-01 09:30:00"), 100L),
    (10L, ts("2024-01-01 10:00:00"), 200L), // exact tie with left event 1
    (10L, ts("2024-01-01 10:45:00"), 300L),
    (20L, ts("2024-01-01 08:00:00"), 400L)
  ).toDF("user_id", "ts", "v")

  test("asOfJoin: backward-inclusive latest match per key; no-predecessor is null") {
    val out = AsOf.asOfJoin(left, right, "user_id", "ts", "ts", Seq("v"))
      .orderBy("event_id").collect()
    // event 1 at 10:00 matches the 10:00 right row (inclusive), not 09:30
    assert(out(0).getAs[Long]("asof_v") == 200L)
    assert(out(0).getAs[java.sql.Timestamp]("asof_ts") == ts("2024-01-01 10:00:00"))
    // event 2 at 11:00 matches 10:45
    assert(out(1).getAs[Long]("asof_v") == 300L)
    // event 3 at 09:00 precedes every user-10 right row
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v")))
    assert(out(2).isNullAt(out(2).fieldIndex("asof_ts")))
    // other key joins only its own rows
    assert(out(3).getAs[Long]("asof_v") == 400L)
    // left columns pass through untouched
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("asOfJoinTolerance nulls out stale matches, keeps fresh ones") {
    val out = AsOf.asOfJoinTolerance(left, right, "user_id", "ts", "ts",
        Seq("v"), expr("INTERVAL 1 HOUR"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("asof_v") == 200L) // 0 min old: fresh
    assert(out(1).getAs[Long]("asof_v") == 300L) // 15 min old: fresh
    // event 4 at 10:30 vs right 08:00 — 2.5 h stale → nulled
    assert(out(3).isNullAt(out(3).fieldIndex("asof_v")))
    assert(out(3).isNullAt(out(3).fieldIndex("asof_ts")))
  }

  test("asOfJoin plan: union+window, no join operator, no cartesian blowup") {
    val plan = AsOf.asOfJoin(left, right, "user_id", "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"cartesian as-of plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"as-of should be union+window, not a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
