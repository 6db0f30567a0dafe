package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting by degree orientation — the fourth graph
  * primitive beside connected components (Dedup's pointer-jumping),
  * PageRank and ShortestPath. Each undirected edge is oriented from its
  * lower-(degree, id) endpoint; (degree, id) is a total order, so the
  * oriented graph is a DAG and every triangle is enumerated exactly once
  * as a wedge at its minimum vertex closed by the oriented third edge.
  *
  * Scale shape: the wedge join's work is Σ_u d_out(u)², which the
  * orientation bounds by O(m^1.5) independent of hub degree (the classic
  * arboricity argument) — a raw join on either endpoint would be
  * Σ d(u)², quadratic in the hottest hub. Three equi-joins, no window,
  * exact BIGINT arithmetic end to end; the input pair frame and the
  * oriented frame are multi-consumer, so both are materialized once
  * (house idiom: column pruning defeats ReuseExchange otherwise).
  */
object Triangles {

  /** @param pairs undirected edge list, one row per edge, columns
    *              (a, b) with a ≠ b and each {a, b} appearing once
    *              (canonical a < b is typical but not required).
    * @return one row: (n_triangles, n_wedges, clustering_coeff) where
    *         n_wedges counts unordered open+closed wedges Σ d(d-1)/2 and
    *         clustering_coeff = round(3·triangles / wedges, 6) (0.0 for
    *         a wedge-free graph).
    */
  def countWithCoefficient(pairs: DataFrame): DataFrame = {
    val p = pairs.toDF("a", "b").localCheckpoint(true)
    // r20 hybrid (the components/PageRank move): three equi-joins + two
    // checkpoints over a pair set that the dedup graphs keep in the low
    // thousands is fixed cost. Under spark.graft.triangles.localMaxEdges
    // (0 disables), run the IDENTICAL degree-oriented enumeration on the
    // driver off the checkpoint's blocks — same (degree, id) orientation,
    // same (dv,v)<(dw,w) wedge order, same oriented-edge closing test,
    // same Σ d(d−1)/2 wedge total, and the coefficient through the same
    // HALF_UP 6-decimal rounding Spark's round() applies. Long vertex
    // ids only; NULLs fall through to the distributed joins.
    val localCap = pairs.sparkSession.conf
      .get("spark.graft.triangles.localMaxEdges", "250000").toLong
    val pIsLong = p.schema.fields
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (pIsLong && localCap > 0 && p.count() <= localCap) {
      val rows = p.collect()
      if (!rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        import scala.collection.mutable
        val deg = mutable.LongMap.empty[Long].withDefaultValue(0L)
        rows.foreach { r =>
          deg(r.getLong(0)) += 1L; deg(r.getLong(1)) += 1L
        }
        val out = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
        val oset = mutable.HashSet.empty[(Long, Long)]
        rows.foreach { r =>
          val a = r.getLong(0); val b = r.getLong(1)
          val aFirst = deg(a) < deg(b) || (deg(a) == deg(b) && a < b)
          val (s, d) = if (aFirst) (a, b) else (b, a)
          out.getOrElseUpdate(s, mutable.ArrayBuffer.empty[Long]) += d
          oset += ((s, d))
        }
        var tri = 0L
        out.valuesIterator.foreach { ds =>
          var i = 0
          while (i < ds.length) {
            var j = 0
            while (j < ds.length) {
              val v = ds(i); val w = ds(j)
              if ((deg(v) < deg(w) || (deg(v) == deg(w) && v < w)) &&
                  oset.contains((v, w))) tri += 1L
              j += 1
            }
            i += 1
          }
        }
        val wed = deg.valuesIterator.map(d => (d * (d - 1)) / 2).sum
        val coeff =
          if (wed > 0)
            java.math.BigDecimal.valueOf(3.0 * tri / wed)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          else 0.0
        org.apache.spark.sql.graftbridge.Bridge.release(p)
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("n_triangles", LongType),
          StructField("n_wedges", LongType),
          StructField("clustering_coeff", DoubleType)))
        return pairs.sparkSession.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(tri, wed, coeff)),
          schema)
      }
    }
    val deg = p.select(col("a").as("v"))
      .unionAll(p.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).cast("long").as("dg"))
      .localCheckpoint(true) // consumed by orientation (×2) + wedge total
    val withDeg = p
      .join(deg.select(col("v").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("dg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .localCheckpoint(true) // consumed by both wedge sides + closing join
    val x = o.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val y = o.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    val wedges = x.join(y, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    // left_semi keeps per-wedge multiplicity (one row per distinct wedge);
    // it tests "does the closing oriented edge exist", it does not dedup
    val tri = wedges
      .join(o.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).cast("long").as("n_triangles"))
    val wed = deg.agg(coalesce(sum(expr("(dg*(dg-1)) DIV 2")), lit(0L))
      .cast("long").as("n_wedges"))
    tri.crossJoin(broadcast(wed))
      .select(col("n_triangles"), col("n_wedges"),
        round(when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges"))
          .otherwise(lit(0.0)), 6).as("clustering_coeff"))
  }
}
