package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column non-null count, exact
  * distinct count, and min/max (string-rendered so heterogeneous columns
  * stack into one report) — the statistics a cost-based optimizer (join
  * reorder, broadcast decisions) and a corpus owner's sanity pass both
  * start from.
  *
  * Plan shape: ONE corpus scan. The multi-column DISTINCT aggregate goes
  * through Spark's Expand (one input row fans to #cols aggregation
  * streams — the standard exact-multi-distinct plan), then the single
  * result row is `stack`-unpivoted into one row per column. At 100 TB
  * the Expand multiplies the scan by #cols; profile the columns you
  * need, or swap the exact distinct for the KMV sketch (`ops.Kmv`,
  * sk1 family) when an estimate serves — this operator is the EXACT
  * profile, priced accordingly.
  *
  * min/max string-render caveat: keep to integer/string/date columns —
  * float formatting differs across engines (the determinism contract's
  * known hazard), and a profile exists to be compared.
  */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // names are interpolated into a selectExpr stack (and into the SQL
    // oracle) — restrict to plain identifiers so quoting can't break
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"columnProfile needs plain identifier column names, got: $cols")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val stacked = cols
      .map(c => s"'$c', __n_$c, __d_$c, __mn_$c, __mx_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stacked) AS " +
        "(column_name, n_nonnull, n_distinct, min_val, max_val)")
  }

  /** DuckDB oracle twin: one UNION ALL leg per column over `table`. */
  def columnProfileOracleSql(table: String, cols: Seq[String]): String = {
    val legs = cols.map { c =>
      s"""SELECT '$c' AS column_name, CAST(count($c) AS BIGINT) AS n_nonnull,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val FROM $table""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""SELECT * FROM (
       |$legs) ORDER BY column_name""".stripMargin
  }
}
