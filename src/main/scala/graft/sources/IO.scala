package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2.1 S1-S9) as thin, uniform wrappers. The point
  * at scale is the *layout*, not the call: partitioned parquet with
  * event-time bucketing so partition pruning kicks in, append-mode
  * idempotence via deterministic file naming (Spark handles), and
  * schema-on-read with explicit casts at exactly one boundary (etl.Clean).
  */
object IO {

  /** S1: parquet scan. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S2 (batch twin): JSON-lines with a declared wire schema — no inference
    * pass over 100 TB.
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S7: CSV sink with header (the reference's append-with-header-on-create,
    * `Historical_data_cleaning.py:123`).
    */
  def writeCsv(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** S5/S6: parquet staging/append sink. */
  def writeParquet(df: DataFrame, path: String, append: Boolean = false): Unit =
    df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite).parquet(path)

  /** Event-time partitioned layout: `<root>/date=YYYY-MM-DD/…` — the 100 TB
    * layout that makes F3/F6/F7-style time predicates prune whole
    * partitions instead of scanning (`PartitionFilters` in explain).
    */
  def writeTimePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite).partitionBy("date").parquet(path)

  /** S3 (batch twin): Kafka wire format — one JSON object per record.
    * Streaming: same selectExpr + writeStream.format("kafka").
    */
  def toJsonRecords(df: DataFrame): DataFrame =
    df.selectExpr("to_json(struct(*)) AS value")

  /** S9: table DDL / reset. `CREATE OR REPLACE` ≡ overwrite save; the
    * reference's TRUNCATE loop (`Dashboard_Live_Final.py:129-135`) becomes
    * an overwrite with an empty frame of the same schema.
    */
  def createOrReplaceTable(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(name)

  def truncateTable(spark: SparkSession, name: String): Unit = {
    val schema = spark.table(name).schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode(SaveMode.Overwrite).saveAsTable(name)
  }

  /** X14: information_schema-style existence probe + row count
    * (`Dashboard_Historical_Final.py:725-735`).
    */
  def tableStatus(spark: SparkSession, name: String): Option[Long] =
    if (spark.catalog.tableExists(name)) Some(spark.table(name).count()) else None

  /** Bucketed + sorted table layout: two tables bucketed on their join key
    * with the same bucket count join with NO exchange on either side — the
    * co-located join that turns the recurring 100 TB fact-to-fact shuffle
    * into a local merge (asserted shuffle-free in IoSpec).
    */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
}
