package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-source shortest path by iterative min-plus relaxation
  * (Bellman–Ford rounds) — the third graph primitive beside connected
  * components (Dedup's pointer-jumping) and PageRank. Costs are exact
  * integers, so a fixed-round run is engine-portable and hash-gatable
  * against an unrolled SQL oracle (EventQueries g2); `least()` skips
  * NULLs identically on both engines, which is what lets "unreached"
  * be represented as NULL with no sentinel arithmetic.
  *
  * Scale shape: per round ONE edges⋈dists join (edge frame partitioned
  * by src; broadcast the dist frame for label-sized graphs) and ONE
  * groupBy(dst) min — the same plan skeleton as PageRank.ranks, with
  * the same checkpoint-truncated lineage. `iters` bounds path length:
  * iters ≥ graph diameter ⇒ exact distances; fewer ⇒ best-within-k-hops
  * (the bounded-exploration mode a 100 TB graph actually runs).
  */
object ShortestPath {

  /** @param edges (src, dst, cost) — non-negative long costs.
    * @param source the source node value.
    * @param iters  relaxation rounds (path-length bound).
    */
  def sssp(edges: DataFrame, source: Column, iters: Int): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val ed = edges.toDF("src", "dst", "cost")
      .select(col("src"), col("dst"), col("cost").cast("long").as("cost"))
      .localCheckpoint(true) // reused every round
    // r20 hybrid (the components()/PageRank move): under
    // spark.graft.sssp.localMaxEdges (0 disables), run the identical
    // fixed-round Bellman–Ford relaxation on the driver off the
    // checkpoint's blocks — same min-plus folds on the same longs,
    // bit-identical distances (NULL = unreached, exactly the frame
    // semantics). NULL endpoints fall through to the loop.
    val localCap = edges.sparkSession.conf
      .get("spark.graft.sssp.localMaxEdges", "250000").toLong
    if (localCap > 0 && ed.count() <= localCap) {
      val rows = ed.collect()
      if (rows.nonEmpty &&
          !rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        import scala.collection.mutable
        // resolve the source literal the same way the frame would:
        // equality against the node values
        val srcVal = {
          val lit = org.apache.spark.sql.graftbridge.Bridge.expression(source)
          lit match {
            case l: org.apache.spark.sql.catalyst.expressions.Literal =>
              Some(org.apache.spark.sql.catalyst.CatalystTypeConverters
                .convertToScala(l.value, l.dataType))
            case _ => None
          }
        }
        if (srcVal.isDefined) {
          val nodeSet = mutable.LinkedHashSet.empty[Any]
          rows.foreach { r => nodeSet += r.get(0); nodeSet += r.get(1) }
          var d = mutable.AnyRefMap.empty[AnyRef, Long]
          nodeSet.find(_ == srcVal.get)
            .foreach(n => d(n.asInstanceOf[AnyRef]) = 0L)
          for (_ <- 1 to iters) {
            val next = d.clone()
            rows.foreach { e =>
              val src = e.get(0).asInstanceOf[AnyRef]
              val dst = e.get(1).asInstanceOf[AnyRef]
              d.get(src).foreach { ds =>
                val cand = ds + e.getLong(2)
                if (next.get(dst).forall(cand < _)) next(dst) = cand
              }
            }
            d = next
          }
          val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodeSet.size)
          nodeSet.foreach { n =>
            out.add(org.apache.spark.sql.Row(n,
              d.get(n.asInstanceOf[AnyRef]).map(Long.box).orNull))
          }
          org.apache.spark.sql.graftbridge.Bridge.release(ed)
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              ed.schema("src").dataType),
            org.apache.spark.sql.types.StructField("min_cost",
              org.apache.spark.sql.types.LongType)))
          return edges.sparkSession.createDataFrame(out, schema)
        }
      }
    }
    val nd = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var r = nd.select(col("node"),
      when(col("node") === source, 0L).otherwise(lit(null).cast("long"))
        .as("d"))
    for (_ <- 1 to iters) {
      val m = ed
        .join(r.select(col("node").as("src"), col("d")), "src")
        .filter(col("d").isNotNull)
        .groupBy(col("dst"))
        .agg(min(col("d") + col("cost")).as("md"))
      r = r.join(m.select(col("dst").as("node"), col("md")), Seq("node"), "left")
        .select(col("node"), least(col("d"), col("md")).as("d"))
        .localCheckpoint(true) // truncate the iterative lineage
    }
    r.select(col("node"), col("d").cast("long").as("min_cost"))
  }
}
