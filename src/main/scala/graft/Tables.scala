package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At cluster scale the same call sites would point at partitioned table roots
  * (e.g. `s3://…/events/date=…`); everything downstream operates on the
  * DataFrame, so only this object changes. Filters/projections applied by the
  * operators are pushed into these parquet scans by Catalyst (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long (legacy conf) and truncate
    * to microseconds — exactly what DuckDB's `CAST(ts AS TIMESTAMP)` does,
    * so both engines see the identical microsecond timeline.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session —
    * set once at session construction (Bench/Verify/Explain/TestSpark all
    * do) rather than mutated here: table loaders must not flip session-wide
    * conf mid-flight under concurrent queries.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build time " +
        "(events.parquet stores TIMESTAMP(NANOS))")
    table(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
