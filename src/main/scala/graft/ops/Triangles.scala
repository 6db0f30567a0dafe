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
