package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS (c47) — the publish gate a
  * managed corpus runs before a refresh ships (validate the candidate
  * snapshot, apply only if the report passes): named row-level rules
  * and key-uniqueness checks evaluated into one
  * `(rule, n_rows, n_violations, pass)` report.
  *
  * Scale shape: ALL row-level rules ride ONE scan — each rule becomes a
  * conditional-sum aggregate in a single global agg (map-side partial,
  * one 1-row reduce), then the 1-row frame unpivots to per-rule rows
  * driver-free; a 100-rule suite over 100 TB costs one pass, not 100.
  * Uniqueness is inherently a groupBy (one shuffle per key set).
  *
  * NULL discipline: a rule's predicate evaluating to NULL counts as a
  * VIOLATION (`coalesce(pred, false)`) — SQL's ternary logic would
  * otherwise let `length(text) <= 256` silently bless NULL texts, the
  * classic expectations trap. Uniqueness counts NULL keys as a real
  * group (duplicate NULL ids are duplicate rows, not invisible ones).
  */
object Expectations {

  /** Evaluate named row-level rules in ONE pass: violations are rows
    * where the predicate is not TRUE (NULL counts as a violation).
    */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(coalesce(p, lit(false)), lit(0L)).otherwise(lit(1L))),
        lit(0L)).as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"))
    }
    row.select(inline(array(perRule: _*)))
      .withColumn("pass", (col("n_violations") === 0L).cast("long"))
  }

  /** Key-uniqueness expectation: violations are the rows beyond the
    * first per key (`Σ max(count − 1, 0)`), NULL keys grouped like any
    * other value. Same report schema as [[validate]] so the suites
    * union.
    */
  def uniqueViolations(df: DataFrame, name: String,
                       keys: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).cast("long").as("pass"))

  /** A whole expectation suite: row rules (one scan) ∪ uniqueness
    * checks (one shuffle each), ordered by rule name — the report a
    * publish gate reads top to bottom.
    */
  def report(df: DataFrame, rules: Seq[(String, Column)],
             uniqueKeys: Seq[(String, Seq[Column])] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty,
      "report needs at least one rule or unique-key check")
    val rows = if (rules.nonEmpty) Some(validate(df, rules)) else None
    val uniq = uniqueKeys.map { case (n, ks) => uniqueViolations(df, n, ks) }
    (rows.toSeq ++ uniq).reduce(_ unionByName _).orderBy(col("rule"))
  }

  /** One micro-batch of the quality TIME SERIES: this batch's
    * [[report]] lands in a `(batch_id → rules)` parquet store —
    * dynamic overwrite of the batch's OWN partition, so at-least-once
    * replays are no-ops (the d9 staging idempotence convention). The
    * store is ≤ batches × rules rows: the per-batch panel the c40-style
    * drift/decision reads consume, at zero marginal corpus cost beyond
    * the batch's own validation pass. Uniqueness here is WITHIN-batch
    * (cross-batch uniqueness is the snapshot store's fence, not a
    * streaming expectation).
    */
  /** The `(rule, n_rows, n_violations, pass)` report schema every
    * suite/report write shares.
    */
  val reportSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rule",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_violations",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pass",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** `extraReport`: precomputed `(rule, n_rows, n_violations)` lines a
    * caller derived OUTSIDE the batch frame (e.g. census-level guards
    * over a changelog + store count) — they land in the same per-batch
    * partition write and count toward the verdict.
    */
  def validateBatch(batch: DataFrame, batchId: Long, reportPath: String,
                    rules: Seq[(String, Column)],
                    uniqueKeys: Seq[(String, Seq[Column])] = Nil,
                    extraReport: Seq[(String, Long, Long)] = Nil): Boolean = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty || extraReport.nonEmpty,
      "validateBatch needs at least one rule, unique-key or extra line")
    val spark = batch.sparkSession
    // Collect ONCE (≤ |rules| + |uniqueKeys| rows): the same tiny frame
    // feeds the store write AND the pass/fail verdict, so a publish
    // gate's decision is O(1) — no re-read of the growing report store.
    val frameRows: Seq[org.apache.spark.sql.Row] =
      if (rules.isEmpty && uniqueKeys.isEmpty) Nil
      else report(batch, rules, uniqueKeys).collect().toIndexedSeq
    val extraRows = extraReport.map { case (n, nr, nv) =>
      org.apache.spark.sql.Row(n, nr, nv, if (nv == 0L) 1L else 0L)
    }
    val rows = (frameRows ++ extraRows).sortBy(_.getString(0))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), reportSchema)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(reportPath)
    rows.forall(_.getLong(3) == 1L) // pass column (extra rows are schema-less)
  }

  /** Streaming data-quality monitoring: every micro-batch appends its
    * expectation report to the store via [[validateBatch]] — the
    * pass/fail time series a publish gate or alerting read consumes.
    */
  def expectationsIngest(raw: DataFrame, reportPath: String,
                         rules: Seq[(String, Column)],
                         uniqueKeys: Seq[(String, Seq[Column])] = Nil,
                         queryName: String = "graft_expectations_ingest"): org.apache.spark.sql.streaming.StreamingQuery =
    raw.writeStream.queryName(queryName)
      .foreachBatch { (b: DataFrame, id: Long) =>
        validateBatch(b, id, reportPath, rules, uniqueKeys)
        ()
      }.start()
}
