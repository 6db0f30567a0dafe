package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Scale-safe batch EWMA (W4/ST5 at 100 TB): one shuffle on the key, a sort
  * within each partition, then a streaming left fold over the sorted rows —
  * O(1) state per key and O(partition) memory, versus the
  * `collect_list`-based formulation (EventQueries w4,
  * `RedsetPipeline.stressIndex`) whose per-key array grows with series
  * length. Those twins are kept for DuckDB `list_reduce` oracle parity;
  * this operator is gate-checked against the SAME oracle
  * (`w4b_ewma_per_user_scalable`), proving bit-equality, not just
  * agreement with the Spark twin.
  *
  * Bit-parity argument: `repartition(key) + sortWithinPartitions(key,
  * order..., x)` reproduces exactly the per-key element order of
  * `sort_array(collect_list(struct(order..., x)))` (the struct comparator
  * is field-by-field, and x participates as the last tie-break in both),
  * and the fold `alpha * x + (1 - alpha) * acc` performs the same
  * IEEE-754 double operations in the same sequence as the SQL `aggregate`
  * lambda — same doubles in, same doubles out.
  *
  * Streaming twin: `graft.streaming.Streams.ewmaStress`
  * (flatMapGroupsWithState), same recurrence, watermark-evicted state.
  *
  * Reference: the pandas `ewm`-style stress fold
  * (`Dashboard_Live_Final.py:577-624`).
  */
object Ewma {

  /** One EWMA per key and alpha over the event-time-ordered `valueCol`.
    *
    * @param df       input frame
    * @param key      grouping column (any orderable, hash-partitionable type)
    * @param order    event-order columns within the key (must be a total
    *                 order per key in practice; `valueCol` is appended as a
    *                 final tie-break exactly like the struct sort)
    * @param valueCol column folded (cast to double)
    * @param alphas   (outputName, alpha) per smoothing constant — one pass
    *                 computes all of them
    * @return one row per key: (key, alphas...) — raw doubles, callers apply
    *         display rounding
    */
  def perKey(df: DataFrame, key: String, order: Seq[String], valueCol: String,
             alphas: Seq[(String, Double)]): DataFrame = {
    val keyField = df.schema(key)
    val projected = df.select(
      (col(key) +: order.map(col) :+ col(valueCol).cast(DoubleType).as("__x")): _*)
    val xIdx = projected.columns.length - 1
    val sorted = projected
      .repartition(col(key))
      .sortWithinPartitions((col(key) +: order.map(col) :+ col("__x")): _*)
    val outSchema = StructType(
      StructField(key, keyField.dataType, keyField.nullable) +:
        alphas.map { case (n, _) => StructField(n, DoubleType, nullable = true) })
    val as = alphas.map(_._2).toArray
    val bs = as.map(1.0 - _) // same arithmetic as the twins' lit(1 - alpha)
    sorted.mapPartitions { rows =>
      new Iterator[Row] {
        private val acc = new Array[Double](as.length)
        private var curKey: Any = null
        private var open = false     // a key's fold is in progress
        private var sawNull = false  // null x poisons the fold (twin parity)
        private var out: Row = null  // emitted row waiting for next()
        private def emit(): Row =
          if (sawNull) Row.fromSeq(curKey +: Seq.fill[Any](as.length)(null))
          else Row.fromSeq(curKey +: acc.toSeq)
        private def start(r: Row, k: Any): Unit = {
          curKey = k
          sawNull = r.isNullAt(xIdx)
          if (!sawNull) java.util.Arrays.fill(acc, r.getDouble(xIdx))
        }
        override def hasNext: Boolean = {
          if (out != null) return true
          while (rows.hasNext) {
            val r = rows.next()
            val k = r.get(0)
            if (!open) {
              open = true; start(r, k)
            } else if (k == curKey) {
              // a null anywhere in the series nulls the whole fold — exactly
              // what the aggregate-HOF twin's null arithmetic produces
              if (r.isNullAt(xIdx)) sawNull = true
              else if (!sawNull) {
                val x = r.getDouble(xIdx)
                var i = 0
                while (i < as.length) {
                  acc(i) = as(i) * x + bs(i) * acc(i); i += 1
                }
              }
            } else {
              out = emit()
              start(r, k)
              return true
            }
          }
          if (open) { out = emit(); open = false; return true }
          false
        }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = out; out = null; r
        }
      }
    }(Encoders.row(outSchema))
  }
}
