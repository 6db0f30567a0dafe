package graft
import graft.queries.{DocQueries, EventQueries, QDef, RedsetQueries, TpchQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operators live in the QDef registries; this object only adapts them
  * to the driver's Map-based interface.
  */
object SparkEntry {
  val all: Seq[QDef] = TpchQueries.defs ++ EventQueries.defs ++ DocQueries.defs ++
    RedsetQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * carry ScalaTest property oracles instead).
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
