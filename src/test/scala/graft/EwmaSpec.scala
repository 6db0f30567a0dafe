package graft

import graft.ops.Ewma

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-safe EWMA fold (Ewma.perKey) must be BIT-identical to the
  * collect_list + aggregate-HOF formulation it replaces at scale — same
  * element order, same IEEE-754 operation sequence.
  */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 keys × ~50 events, deterministic but order-scrambled input spread
  // over several partitions (mapPartitions must not depend on input layout)
  private lazy val df = (1 to 2000).map { i =>
    val k = (i * 7919) % 40
    val ts = ((i * 104729) % 500).toLong // duplicate ts values across keys
    val v = ((i * 31) % 997).toDouble / 7.0
    (k.toLong, ts, i.toLong, v)
  }.toDF("k", "ts", "id", "v").repartition(7)

  private def hofTwin(alpha: Double) = {
    val xs = df.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("ts"), col("id"), col("v")))).as("xs"))
    xs.select(col("k"),
      aggregate(
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        element_at(col("xs"), 1).getField("v"),
        (acc, x) => lit(alpha) * x.getField("v") + lit(1 - alpha) * acc).as("e"))
  }

  test("perKey is bit-identical to the collect_list fold (no rounding)") {
    val scalable = Ewma.perKey(df, "k", Seq("ts", "id"), "v", Seq("e" -> 0.02))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val twin = hofTwin(0.02)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalable.keySet == twin.keySet)
    scalable.foreach { case (k, v) =>
      // bit equality, not approximate: same doubles in the same order
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(twin(k)), s"key $k")
    }
  }

  test("multiple alphas fold in one pass and match independent folds") {
    val both = Ewma.perKey(df, "k", Seq("ts", "id"), "v",
        Seq("short" -> 0.02, "long" -> 0.005))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val s = hofTwin(0.02).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val l = hofTwin(0.005).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    both.foreach { case (k, (a, b)) =>
      assert(a == s(k) && b == l(k), s"key $k")
    }
  }

  test("degenerate inputs: empty frame, single-element keys") {
    val empty = Ewma.perKey(df.filter(lit(false)), "k", Seq("ts", "id"), "v",
      Seq("e" -> 0.02))
    assert(empty.count() == 0L)
    val single = Ewma.perKey(
      Seq((1L, 10L, 1L, 42.5), (2L, 20L, 2L, 7.25))
        .toDF("k", "ts", "id", "v"),
      "k", Seq("ts", "id"), "v", Seq("e" -> 0.02))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(single == Map(1L -> 42.5, 2L -> 7.25)) // init = first value
  }

  test("plan: exactly one exchange (the key repartition), no collect_list") {
    // un-repartitioned input: the only exchange must be Ewma's own
    val flatDf = (1 to 100).map(i => ((i % 5).toLong, i.toLong, i.toLong,
      i.toDouble)).toDF("k", "ts", "id", "v")
    val plan = Ewma.perKey(flatDf, "k", Seq("ts", "id"), "v", Seq("e" -> 0.02))
      .queryExecution.executedPlan.toString
    // AQE hides Exchange nodes from collect() until execution — count
    // occurrences in the rendered plan instead
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("collect_list"))
  }

  test("a null value anywhere in a series nulls that key, like the HOF fold") {
    val withNulls = Seq(
      (1L, 1L, 1L, Some(5.0)), (1L, 2L, 2L, None), (1L, 3L, 3L, Some(7.0)),
      (2L, 1L, 4L, Some(4.0)), (2L, 2L, 5L, Some(6.0)),
      (3L, 1L, 6L, None)
    ).toDF("k", "ts", "id", "v")
    val scalable = Ewma.perKey(withNulls, "k", Seq("ts", "id"), "v", Seq("e" -> 0.02))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val twin = {
      val xs = withNulls.groupBy(col("k"))
        .agg(sort_array(collect_list(struct(col("ts"), col("id"), col("v")))).as("xs"))
      xs.select(col("k"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("v"),
          (acc, x) => lit(0.02) * x.getField("v") + lit(0.98) * acc).as("e"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    }
    assert(scalable == twin)
    assert(scalable(1L).isEmpty && scalable(3L).isEmpty && scalable(2L).isDefined)
  }

  test("property: bit-parity holds on randomized series shapes") {
    // scalacheck-generated irregular shapes: key cardinality, series
    // length, duplicate timestamps, extreme magnitudes
    val gen = org.scalacheck.Gen.listOfN(1500, for {
      k <- org.scalacheck.Gen.chooseNum(0L, 25L)
      ts <- org.scalacheck.Gen.chooseNum(0L, 30L) // heavy ts collisions
      v <- org.scalacheck.Gen.oneOf(
        org.scalacheck.Gen.chooseNum(-1e12, 1e12),
        org.scalacheck.Gen.oneOf(0.0, -0.0, 1e-300, 1e300))
    } yield (k, ts, v))
    val rows = gen(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(7L)).getOrElse(sys.error("gen failed"))
      .zipWithIndex.map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }
    val rdf = rows.toDF("k", "ts", "id", "v").repartition(5)
    val scalable = Ewma.perKey(rdf, "k", Seq("ts", "id"), "v", Seq("e" -> 0.02))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val xs = rdf.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("ts"), col("id"), col("v")))).as("xs"))
    val twin = xs.select(col("k"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1).getField("v"),
          (acc, x) => lit(0.02) * x.getField("v") + lit(0.98) * acc).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scalable.keySet == twin.keySet)
    scalable.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(twin(k)), s"key $k")
    }
  }

  test("stressIndexScalable equals stressIndex exactly") {
    val events = (1 to 500).map { i =>
      val inst = (i % 7).toLong
      (inst, new java.sql.Timestamp(((i * 7919) % 400) * 1000L), i.toLong,
        ((i * 13) % 600000).toLong)
    }.toDF("instance_id", "arrival_timestamp", "query_id",
      "execution_duration_ms").repartition(5)
    val a = graft.pipeline.RedsetPipeline.stressIndex(events)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = graft.pipeline.RedsetPipeline.stressIndexScalable(events)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a == b)
  }
}
