package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's native data model: the 24-column Redset query-log event
  * (SURVEY.md §1.2; reference DDL `Historical_data_cleaning.py:70-97`,
  * producer dtype map `producer_Final.py:198-224`). One StructType replaces
  * the reference's four divergent dtype maps; `clean` owns every coercion so
  * nothing downstream re-casts (§1.4).
  */
object RedsetSchema {
  val schema: StructType = StructType(Seq(
    StructField("instance_id", LongType),
    StructField("cluster_size", LongType),
    StructField("user_id", LongType),
    StructField("database_id", LongType),
    StructField("query_id", LongType),
    StructField("arrival_timestamp", TimestampType),
    StructField("compile_duration_ms", LongType),
    StructField("queue_duration_ms", LongType),
    StructField("execution_duration_ms", LongType),
    StructField("feature_fingerprint", StringType),
    StructField("was_aborted", BooleanType),
    StructField("was_cached", BooleanType),
    StructField("cache_source_query_id", StringType),
    StructField("query_type", StringType),
    StructField("num_permanent_tables_accessed", LongType),
    StructField("num_external_tables_accessed", LongType),
    StructField("num_system_tables_accessed", LongType),
    StructField("read_table_ids", StringType),
    StructField("write_table_ids", StringType),
    StructField("mbytes_scanned", LongType),
    StructField("mbytes_spilled", LongType),
    StructField("num_joins", LongType),
    StructField("num_scans", LongType),
    StructField("num_aggregations", LongType)))

  /** Raw wire schema: everything as strings (what `from_json` of a Kafka
    * message yields before typing).
    */
  val rawSchema: StructType =
    StructType(schema.fields.map(f => StructField(f.name, StringType)))

  /** Sentinel table id treated as null (Dashboard/update_tables.py:214,224). */
  val NullTableId = 999999L

  /** Ingestion query types (Dashboard_Historical_Final.py:236). */
  val IngestTypes: Seq[String] = Seq("insert", "copy")
}

/** The cleaning transform (SURVEY §2.9 X6–X9 + F2), one pass, all
  * expression-based (codegen'd, fully parallel — no driver-side loops, no
  * UDFs; at 100 TB this is a single map stage fused into the scan).
  *
  * Semantics mirrored from `Historical_data_cleaning.py:35-66` and
  * `ddb_wrappers-1.py:53-86`:
  *  - literal "NULL"/""/null strings → defaults ("UNKNOWN" for categories)
  *  - unparseable timestamps → epoch (1970-01-01)
  *  - non-numeric metrics → 0; null booleans → false
  *  - query_type lower/trim normalized
  *  - rows with empty/null read & write table-id lists dropped
  */
object Clean {
  import RedsetSchema._

  private def cleanStr(c: Column, default: String): Column =
    when(c.isNull || trim(c) === "" || upper(trim(c)) === "NULL", lit(default))
      .otherwise(trim(c))

  // try_cast everywhere: ANSI mode (Spark 4 default) makes plain cast THROW
  // on malformed input; the cleaning contract is errors='coerce' → default.
  // Numerics route through double first so "12.0" → 12 for integer targets
  // (matching pandas to_numeric + astype on float64 raws).
  private def cleanNum(c: Column, t: DataType): Column =
    coalesce(c.try_cast(DoubleType), lit(0.0)).cast(t)

  /** The cleaned form of one numeric column — exposed so callers can derive
    * partition keys from a RAW frame without running the full 24-column
    * cleaning projection (touched-bucket discovery in
    * [[graft.pipeline.RedsetPipeline.incrementalBatch]] hashes the cleaned
    * `instance_id` straight off the wire batch).
    */
  def num(c: Column): Column = cleanNum(c, LongType)

  private def cleanBool(c: Column): Column =
    coalesce(c.try_cast(BooleanType), lit(false))

  private def cleanTs(c: Column): Column =
    coalesce(c.try_cast(TimestampType), to_timestamp(lit("1970-01-01 00:00:00")))

  /** Type + default every column of a raw (string-typed or loosely typed)
    * Redset frame; drop rows whose table-id lists are both empty.
    *
    * The F2 row drop runs BEFORE the projection, phrased on the raw
    * columns: `emptyList(cleanStr(c))` placed after the select gets
    * predicate-pushed below it with the cleaning expression substituted
    * into all four comparisons — ~12 evaluations of the raw column
    * expression per row (measured 2.5-5x the whole chain's cost when the
    * raw frame is itself computed, e.g. a `from_json` wire batch or the
    * synthesized gate fixture). `rawEmptyList` is the same predicate with
    * one `trim` per column.
    */
  def apply(raw: DataFrame): DataFrame = {
    // F2: drop rows referencing no tables at all (Historical_data_cleaning.py:58-60)
    val kept = raw.filter(!(rawEmptyList(col("read_table_ids")) &&
                            rawEmptyList(col("write_table_ids"))))
    val typed = kept.select(
      cleanNum(col("instance_id"), LongType).as("instance_id"),
      cleanNum(col("cluster_size"), LongType).as("cluster_size"),
      cleanNum(col("user_id"), LongType).as("user_id"),
      cleanNum(col("database_id"), LongType).as("database_id"),
      cleanNum(col("query_id"), LongType).as("query_id"),
      cleanTs(col("arrival_timestamp")).as("arrival_timestamp"),
      cleanNum(col("compile_duration_ms"), LongType).as("compile_duration_ms"),
      cleanNum(col("queue_duration_ms"), LongType).as("queue_duration_ms"),
      cleanNum(col("execution_duration_ms"), LongType).as("execution_duration_ms"),
      cleanStr(col("feature_fingerprint"), "UNKNOWN").as("feature_fingerprint"),
      cleanBool(col("was_aborted")).as("was_aborted"),
      cleanBool(col("was_cached")).as("was_cached"),
      cleanStr(col("cache_source_query_id"), "UNKNOWN").as("cache_source_query_id"),
      lower(cleanStr(col("query_type"), "UNKNOWN")).as("query_type"),
      cleanNum(col("num_permanent_tables_accessed"), LongType).as("num_permanent_tables_accessed"),
      cleanNum(col("num_external_tables_accessed"), LongType).as("num_external_tables_accessed"),
      cleanNum(col("num_system_tables_accessed"), LongType).as("num_system_tables_accessed"),
      cleanStr(col("read_table_ids"), "").as("read_table_ids"),
      cleanStr(col("write_table_ids"), "").as("write_table_ids"),
      cleanNum(col("mbytes_scanned"), LongType).as("mbytes_scanned"),
      cleanNum(col("mbytes_spilled"), LongType).as("mbytes_spilled"),
      cleanNum(col("num_joins"), LongType).as("num_joins"),
      cleanNum(col("num_scans"), LongType).as("num_scans"),
      cleanNum(col("num_aggregations"), LongType).as("num_aggregations"))
    typed
  }

  /** Emptiness of a raw table-id list, exactly `emptyList(cleanStr(c, ""))`
    * unfolded: cleanStr maps null/blank/'NULL' (any case) to the default ""
    * (empty), otherwise trims — so the cleaned value is "[]"/"UNKNOWN" iff
    * the trimmed raw is (case-sensitive, matching emptyList's equality).
    */
  private def rawEmptyList(c: Column): Column =
    c.isNull || trim(c) === "" || upper(trim(c)) === "NULL" ||
      trim(c) === "[]" || trim(c) === "UNKNOWN"

  /** Synthetic batch_id (§1.2 last row; producer_Final.py:111): sequential
    * index over the event-time order, integer-divided by batchSize. The
    * global row_number window reproduces the reference exactly; at scale
    * use [[withBatchIdScalable]] when batch boundaries need not be
    * globally dense.
    */
  def withBatchId(cleaned: DataFrame, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cleaned.withColumn("batch_id",
      ((row_number().over(Window.orderBy(col("arrival_timestamp"), col("query_id")))
        - 1) / batchSize).cast("long"))
  }

  /** [[withBatchId]]'s SCALE twin: the reference's globally-DENSE batch
    * ids need a single-task global sort window — the whole event stream
    * funnels through one executor. Here `batch_id` is
    * `monotonically_increasing_id() div batchSize`: pure projection,
    * zero shuffles, and the properties every downstream consumer
    * actually relies on still hold — ids are non-negative, each batch
    * holds AT MOST `batchSize` rows (a partition's id block starts at
    * `partitionId << 33`, so blocks never interleave below ~8.6e9 rows
    * per input partition), and rows of one batch are contiguous
    * arrivals WITHIN an input partition. What is given up is exactly
    * the part that cannot scale: global density and cross-partition
    * arrival order of the ids (batches at partition edges may run
    * short). The S4 fan-out multiplexes per batch and never interprets
    * id magnitude — spec-pinned on both forms. Gated rows-only: ids
    * are engine-internal (they depend on the partitioning), so the
    * dense window form stays the oracle-parity plan.
    */
  def withBatchIdScalable(cleaned: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    cleaned.withColumn("batch_id",
      expr(s"monotonically_increasing_id() div ${batchSize}L"))
  }

  /** X10: flatten the comma-separated table-id lists into one row per
    * (query, referenced table) — the `flattened_table_ids` shape
    * (Dashboard_Historical_Final.py:30-38, explode at
    * Dashboard_Live_Final.py:680-689). 999999 sentinel ids are nulled
    * (F8, update_tables.py:214,224).
    *
    * Scale note: explode fan-out is bounded by ids-per-query (small); it
    * multiplies rows before the interval join, so we project to the six
    * needed columns *first* (column pruning keeps the shuffle narrow).
    *
    * The id-list parse is the native [[graft.expr.ParseTableIds]] — the
    * equivalent `filter(transform(split(regexp_replace(...))))` HOF chain
    * evaluates interpreted and drags the whole projection feeding the
    * Generate out of whole-stage codegen (CleanSpec proves the two agree;
    * the HOF twin lives there).
    */
  def flatten(cleaned: DataFrame): DataFrame = {
    def ids(c: Column): Column =
      graft.expr.TableIdExpressions.tableIds(c, RedsetSchema.NullTableId)
    cleaned.select(
      col("instance_id"), col("query_id"), col("arrival_timestamp"),
      col("query_type"),
      explode_outer(ids(col("write_table_ids"))).as("write_table_id"),
      col("read_table_ids"))
      .select(
        col("instance_id"), col("query_id"), col("arrival_timestamp"),
        col("query_type"), col("write_table_id"),
        explode_outer(ids(col("read_table_ids"))).as("read_table_id"))
  }
}
