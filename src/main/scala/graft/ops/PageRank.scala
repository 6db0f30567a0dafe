package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in EXACT integer arithmetic — the iterative-graph
  * operator family beyond connected components (Dedup's pointer-jumping).
  *
  * Ranks live in integer `scale` units (default pico: 10¹²). Damping is
  * the exact rational 17/20 = 0.85, and every per-edge share is an
  * integral division, so the result is bit-identical on any engine that
  * mirrors the fold — no float convergence tolerance, which is what lets
  * a fixed-iteration run be hash-gated against an unrolled SQL oracle
  * (EventQueries g1). Floor losses are bounded: each node loses < 1 unit
  * per division, so total mass stays within |V|·(iters+1) + |E|·iters of
  * `scale` — at pico scale, a relative error < 1e-6 for any graph under
  * a million elements per iteration.
  *
  * Scale shape: per iteration, ONE join of the edge frame against the
  * |V|-sized rank frame (edges shuffle-partitioned by src — or broadcast
  * the rank frame when |V| is small, as with a label/category graph) and
  * ONE groupBy(dst) aggregation. Rank frames are `localCheckpoint`ed per
  * iteration — the d7 iterative-lineage contract: without truncation the
  * plan doubles per round and the 10th iteration replays the 1st.
  * Dangling nodes (no out-edges) leak their damped mass by design — the
  * classic simplification; redistribute explicitly if the graph has
  * significant sinks.
  */
object PageRank {

  /** @param edges frame with columns (src, dst, w) — positive long weights.
    * @param iters fixed iteration count (unroll depth of the oracle).
    * @param scale rank unit denominator; ranks sum to ~scale.
    */
  def ranks(edges: DataFrame, iters: Int,
            scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val ed0 = edges.toDF("src", "dst", "w")
    val ow = ed0.groupBy(col("src"))
      .agg(sum(col("w")).cast("long").as("outw"))
    val ed = ed0.join(ow, "src")
      .select(col("src"), col("dst"), col("w").cast("long").as("w"),
        col("outw"))
      .localCheckpoint(true) // reused every iteration
    // r20 hybrid (the components() move): a label/category graph is a
    // handful of nodes, yet each iteration pays a checkpointed join +
    // aggregate — pure scheduling cost. When the checkpointed edge frame
    // is under spark.graft.pagerank.localMaxEdges (0 disables), run the
    // IDENTICAL integer recurrence on the driver: same floor divisions
    // in the same order on the same longs ⇒ bit-identical ranks. NULL
    // endpoints fall through to the distributed loop (join-semantics
    // parity is not worth mirroring for a degenerate input).
    val localCap = edges.sparkSession.conf
      .get("spark.graft.pagerank.localMaxEdges", "250000").toLong
    if (localCap > 0 && ed.count() <= localCap) {
      val rows = ed.collect()
      // empty graph falls through (the distributed tail returns the
      // empty frame with the right schema; nn = 0 would divide by zero)
      if (rows.nonEmpty &&
          !rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        import scala.collection.mutable
        val nodeSet = mutable.LinkedHashSet.empty[Any]
        rows.foreach { r => nodeSet += r.get(0); nodeSet += r.get(1) }
        val nn = nodeSet.size.toLong
        var r0 = mutable.AnyRefMap.empty[AnyRef, Long]
        nodeSet.foreach(n => r0(n.asInstanceOf[AnyRef]) = scale / nn)
        for (_ <- 1 to iters) {
          val contrib = mutable.AnyRefMap.empty[AnyRef, Long]
          rows.foreach { e =>
            val src = e.get(0).asInstanceOf[AnyRef]
            val dst = e.get(1).asInstanceOf[AnyRef]
            val w = e.getLong(2); val outw = e.getLong(3)
            val c = (((17L * r0(src)) / 20L) * w) / outw
            contrib(dst) = contrib.getOrElse(dst, 0L) + c
          }
          val base = (3L * scale) / (20L * nn)
          val next = mutable.AnyRefMap.empty[AnyRef, Long]
          nodeSet.foreach { n0 =>
            val n = n0.asInstanceOf[AnyRef]
            next(n) = base + contrib.getOrElse(n, 0L)
          }
          r0 = next
        }
        val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodeSet.size)
        nodeSet.foreach { n =>
          out.add(org.apache.spark.sql.Row(n, r0(n.asInstanceOf[AnyRef])))
        }
        org.apache.spark.sql.graftbridge.Bridge.release(ed)
        val nodeType = ed.schema("src").dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nodeType),
          org.apache.spark.sql.types.StructField("rank_scaled",
            org.apache.spark.sql.types.LongType)))
        return edges.sparkSession.createDataFrame(out, schema)
      }
    }
    val nodes = ed0.select(col("src").as("node"))
      .union(ed0.select(col("dst").as("node"))).distinct()
    val nn = nodes.agg(count(lit(1)).cast("long").as("nn"))
    val nd = nodes.crossJoin(broadcast(nn)).localCheckpoint(true)
    var r = nd.select(col("node"), col("nn"),
      expr(s"$scale DIV nn").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"),
          expr("(((17 * r) DIV 20) * w) DIV outw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("insum"))
      r = nd.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("nn"),
          (expr(s"(3 * $scale) DIV (20 * nn)") +
            coalesce(col("insum"), lit(0L))).as("r"))
        .localCheckpoint(true) // truncate the iterative lineage
    }
    r.select(col("node"), col("r").cast("long").as("rank_scaled"))
  }
}
