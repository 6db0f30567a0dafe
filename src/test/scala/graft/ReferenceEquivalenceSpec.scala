package graft

import graft.ops.Intervals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the engine's window-based formulations equal the reference's
  * join-based ones on randomized data (SURVEY §7.4 risk #1: J2's
  * correlated-MIN-subquery "strict next ingest" vs our lead()).
  */
class ReferenceEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // seeded random ingest stream: 5 entities, 200 events, duplicate-free ts
  // per entity (the reference relies on unique arrival order, SURVEY §7.4)
  private lazy val ingests = {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 200).map { i =>
      val key = rnd.nextInt(5).toLong
      (key, i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L +
        rnd.nextInt(30000)))
    }
    rows.toDF("key", "id", "ts")
  }

  test("lead()-based intervals == reference's correlated MIN subquery (J2)") {
    val ours = Intervals.ingestionIntervals(ingests, Seq("key"), "ts", "id")
      .select("key", "current_ts", "next_ts")
      .collect().map(_.toSeq).toSet
    ingests.createOrReplaceTempView("ing")
    // the reference formulation, verbatim shape (update_tables.py:45-78):
    // next = MIN(ts) of the same entity strictly after this ts
    val ref = spark.sql(
      """SELECT t1.key, t1.ts AS current_ts,
        |  (SELECT MIN(t2.ts) FROM ing t2
        |   WHERE t2.key = t1.key AND t2.ts > t1.ts) AS next_ts
        |FROM ing t1""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(ours == ref)
    spark.catalog.dropTempView("ing")
  }

  test("withBatchId reproduces the producer's sequential index // batchSize") {
    val cleaned = ingests.withColumnRenamed("ts", "arrival_timestamp")
      .withColumnRenamed("id", "query_id")
    val got = graft.etl.Clean.withBatchId(cleaned, 10)
      .orderBy("arrival_timestamp", "query_id")
      .select("batch_id").as[Long].collect()
    assert(got.toSeq == (0 until 200).map(i => (i / 10).toLong))
    assert(got.distinct.length == 20)
  }

  test("withBatchIdScalable: bounded batches, shuffle-free, rows preserved") {
    val cleaned = ingests.withColumnRenamed("ts", "arrival_timestamp")
      .withColumnRenamed("id", "query_id")
      .repartition(7) // id blocks must not collide across partitions
      .localCheckpoint(true) // pin the layout; keeps the plan below bare
    val b = graft.etl.Clean.withBatchIdScalable(cleaned, 10)
    val per = b.groupBy("batch_id").count().collect()
    // the invariants the fan-out relies on: every batch at most
    // batchSize rows, no negative ids, nothing lost
    assert(per.map(_.getLong(1)).sum == 200L)
    assert(per.map(_.getLong(1)).max <= 10L)
    assert(per.map(_.getLong(0)).min >= 0L)
    // the point of the twin: a pure projection — no global sort window,
    // no exchange of any kind in the whole plan
    val plan = b.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"scalable batch ids must not shuffle or sort:\n$plan")
  }
}
