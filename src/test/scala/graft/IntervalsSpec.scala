package graft

import graft.ops.Intervals
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val ingests = Seq(
    (1L, 100L, ts("2024-03-01 00:00:00")),
    (1L, 101L, ts("2024-03-01 01:00:00")),
    (1L, 102L, ts("2024-03-01 03:00:00")),
    (2L, 200L, ts("2024-03-01 02:00:00"))
  ).toDF("key", "id", "ts")

  test("ingestionIntervals emits lead() per key with open last interval (J2/W2)") {
    val iv = Intervals.ingestionIntervals(ingests, Seq("key"), "ts", "id")
      .orderBy("key", "current_ts").collect()
    assert(iv.length == 4)
    assert(iv(0).getAs[java.sql.Timestamp]("next_ts") == ts("2024-03-01 01:00:00"))
    assert(iv(1).getAs[java.sql.Timestamp]("next_ts") == ts("2024-03-01 03:00:00"))
    assert(iv(2).isNullAt(iv(2).fieldIndex("next_ts"))) // open
    assert(iv(3).isNullAt(iv(3).fieldIndex("next_ts"))) // other key unaffected
  }

  test("ingestionIntervalsScalable ≡ ingestionIntervals at any bucket width") {
    // random per-key event histories with a mega key (90% of events),
    // ts ties, empty time gaps. width=1 ms puts EVERY row in its own
    // bucket so every successor comes through the carry path; the huge
    // width degenerates to one bucket (pure window); middle widths mix
    val rnd = new scala.util.Random(1537L)
    val rows = (1L to 400L).map { i =>
      val k = if (i % 10 != 0) 1L else 1L + (i % 4)
      // coarse ts grid -> deliberate duplicates (tie-break by id)
      (k, i, new java.sql.Timestamp(1700000000000L + rnd.nextInt(5000) * 1000L))
    }
    val df = rows.toDF("key", "id", "ts")
    val exact = Intervals.ingestionIntervals(df, Seq("key"), "ts", "id")
      .select("key", "id", "current_ts", "next_ts")
      .collect().map(_.toSeq).toSet
    for (w <- Seq(1L, 7000L, 1000L * 86400 * 365)) {
      val got = Intervals.ingestionIntervalsScalable(df, Seq("key"), "ts",
          "id", bucketWidthMs = w)
        .select("key", "id", "current_ts", "next_ts")
        .collect().map(_.toSeq).toSet
      assert(got == exact, s"mismatch at width=$w")
    }
  }

  test("ingestionIntervalsScalable ≡ ingestionIntervals on NULL timestamps") {
    // NULL ts rows sort FIRST in the window form (asc nulls first); the
    // twin routes them through a Long.MinValue sentinel bucket instead
    // of silently dropping them at the carry equi-join. Interior NULL
    // rows must get next_ts = NULL (the next ROW's ts, which is null),
    // not the carry — the struct-lead distinction.
    val df = Seq(
      (1L, 1L, Option(ts("2024-03-01 02:00:00"))),
      (1L, 2L, None: Option[java.sql.Timestamp]),
      (1L, 3L, None: Option[java.sql.Timestamp]),
      (1L, 4L, Option(ts("2024-03-01 01:00:00"))),
      (2L, 5L, None: Option[java.sql.Timestamp]), // all-null key
      (2L, 6L, None: Option[java.sql.Timestamp])
    ).toDF("key", "id", "ts")
    val exact = Intervals.ingestionIntervals(df, Seq("key"), "ts", "id")
      .select("key", "id", "current_ts", "next_ts")
      .collect().map(_.toSeq).toSet
    for (w <- Seq(1L, 3600000L)) {
      val got = Intervals.ingestionIntervalsScalable(df, Seq("key"), "ts",
          "id", bucketWidthMs = w)
        .select("key", "id", "current_ts", "next_ts")
        .collect().map(_.toSeq).toSet
      assert(got == exact, s"NULL-ts mismatch at width=$w:\n$got\nvs\n$exact")
    }
    // sanity on the semantics themselves: last NULL row hands off to the
    // first real event; interior NULL rows stay NULL
    val m = exact.map(r => (r(1), r(3))).toMap
    assert(m(2L) == null && m(3L) == ts("2024-03-01 01:00:00"))
    assert(m(4L) == ts("2024-03-01 02:00:00") && m(1L) == null)
    assert(m(5L) == null && m(6L) == null)
  }

  test("ingestionIntervalsScalable ≡ exact on 8 random histories × widths (property)") {
    // multi-seed sweep over the shapes the single-seed test fixes:
    // varying key counts, mega-key skew, duplicate timestamps, NULL
    // timestamps, sparse time gaps — at a carry-forcing width, an
    // hour, and a one-bucket width
    for (seed <- 1L to 8L) {
      val rnd = new scala.util.Random(7000L + seed)
      val nKeys = 1 + rnd.nextInt(5)
      val skew = rnd.nextBoolean()
      val nulls = rnd.nextBoolean()
      val rows = (1L to (100L + rnd.nextInt(200))).map { i =>
        val k = if (skew && i % 10 != 0) 1L else 1L + (i % nKeys)
        val ts: Option[java.sql.Timestamp] =
          if (nulls && i % 13 == 0) None
          else Some(new java.sql.Timestamp(
            1700000000000L + rnd.nextInt(100000) * 1000L))
        (k, i, ts)
      }
      val df = rows.toDF("key", "id", "ts")
      val exact = Intervals.ingestionIntervals(df, Seq("key"), "ts", "id")
        .select("key", "id", "current_ts", "next_ts")
        .collect().map(_.toSeq).toSet
      for (w <- Seq(1L, 3600000L, 1000L * 86400 * 3650)) {
        val got = Intervals.ingestionIntervalsScalable(df, Seq("key"), "ts",
            "id", bucketWidthMs = w)
          .select("key", "id", "current_ts", "next_ts")
          .collect().map(_.toSeq).toSet
        assert(got == exact, s"seed=$seed width=$w")
      }
    }
  }

  test("intervalJoin matches probes to containing interval, inclusive bounds (J4)") {
    val iv = Intervals.ingestionIntervals(ingests, Seq("key"), "ts", "id").drop("id")
    val probes = Seq(
      (10L, 1L, ts("2024-03-01 00:30:00")), // inside [00:00, 01:00]
      (11L, 1L, ts("2024-03-01 01:00:00")), // boundary: matches both (inclusive BETWEEN)
      (12L, 1L, ts("2024-03-01 09:00:00")), // open interval
      (13L, 2L, ts("2024-03-01 02:30:00")), // key 2 open interval
      (14L, 3L, ts("2024-03-01 02:30:00"))  // unknown key -> dropped (inner)
    ).toDF("pid", "key", "ts")
    val m = Intervals.intervalJoin(probes, iv, Seq("key"), "ts")
    val byPid = m.select("pid").collect().map(_.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(byPid == Map(10L -> 1, 11L -> 2, 12L -> 1, 13L -> 1))
    val p10 = m.filter($"pid" === 10L).head()
    assert(p10.getAs[Long]("time_since_last_ingest_ms") == 30L * 60 * 1000)
    assert(p10.getAs[Long]("time_to_next_ingest_ms") == 30L * 60 * 1000)
    // open interval: interval_end / time_to_next are NULL (no next ingest);
    // the 2999 sentinel is join-condition-internal and never reaches output
    val p12 = m.filter($"pid" === 12L).head()
    assert(p12.isNullAt(p12.fieldIndex("interval_end")))
    assert(p12.isNullAt(p12.fieldIndex("time_to_next_ingest_ms")))
  }

  test("intervalJoinBucketed is semantically identical to intervalJoin") {
    val iv = Intervals.ingestionIntervals(ingests, Seq("key"), "ts", "id").drop("id")
    // probes across bucket boundaries, incl. one inside an interval that
    // spans multiple 30-min buckets and one in the open interval
    val probes = (0 until 50).map { i =>
      (100L + i, 1L + (i % 2), ts(f"2024-03-01 0${i % 8}:${(i * 7) % 60}%02d:00"))
    }.toDF("pid", "key", "ts")
    val plain = Intervals.intervalJoin(probes, iv, Seq("key"), "ts")
      .select("pid", "key", "last_ingest_ts", "interval_end",
        "time_since_last_ingest_ms", "time_to_next_ingest_ms")
      .collect().map(_.toSeq).toSet
    val bucketed = Intervals.intervalJoinBucketed(probes, iv, Seq("key"), "ts",
      bucketSeconds = 1800L)
      .select("pid", "key", "last_ingest_ts", "interval_end",
        "time_since_last_ingest_ms", "time_to_next_ingest_ms")
      .collect().map(_.toSeq).toSet
    assert(bucketed == plain)
    assert(plain.nonEmpty)
  }

  test("overlapJoin equals the direct inequality join, incl. boundaries") {
    // left: half-open [a, b) with one OPEN interval; right: closed
    // [s, e] with a point interval ON a left boundary, a span crossing
    // several 30-min buckets, and a no-overlap control
    val left = Seq(
      (1L, 10L, ts("2024-03-01 00:00:00"), Some(ts("2024-03-01 02:00:00"))),
      (1L, 11L, ts("2024-03-01 02:00:00"), None), // open
      (2L, 20L, ts("2024-03-01 00:00:00"), Some(ts("2024-03-01 00:30:00")))
    ).toDF("key", "iv_id", "a", "b")
    val right = Seq(
      (1L, 1L, ts("2024-03-01 01:30:00"), ts("2024-03-01 03:40:00")), // spans both
      (1L, 2L, ts("2024-03-01 02:00:00"), ts("2024-03-01 02:00:00")), // point on b
      (1L, 3L, ts("2024-02-29 22:00:00"), ts("2024-02-29 23:00:00")), // before all
      (2L, 4L, ts("2024-03-01 00:30:00"), ts("2024-03-01 01:00:00")) // touch at b
    ).toDF("key", "sid", "s", "t")
    val got = Intervals.overlapJoin(left, right, Seq("key"),
        "a", "b", "s", "t", bucketSeconds = 1800L)
      .select("key", "iv_id", "sid", "overlap_ms")
      .collect().map(_.toSeq).toSet
    val l2 = left.select($"key", $"iv_id", $"a",
      coalesce($"b", lit(ts("2999-12-31 00:00:00"))).as("b2"))
    val direct = l2.join(right.withColumnRenamed("key", "rkey"),
        $"key" === $"rkey" && $"a" <= $"t" && $"s" < $"b2")
      .select($"key", $"iv_id", $"sid",
        (unix_millis(least($"b2", $"t")) -
          unix_millis(greatest($"a", $"s"))).as("overlap_ms"))
      .collect().map(_.toSeq).toSet
    assert(got == direct)
    // the boundary semantics themselves: session 2 starts AT left 10's
    // open end (excluded, half-open) but inside 11 (zero-length overlap);
    // session 4 touches left 20's end from inside — the point 00:30 is
    // excluded from [00:00, 00:30) per s < b, so only iv 11/2 matches
    val pairs = got.map(r => (r(1), r(2)))
    assert(pairs.contains((11L, 2L)) && !pairs.contains((10L, 2L)))
    assert(!pairs.contains((20L, 4L)))
    assert(pairs.contains((10L, 1L)) && pairs.contains((11L, 1L)))
  }
}
