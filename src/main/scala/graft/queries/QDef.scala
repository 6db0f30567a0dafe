package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator instantiation: a Spark implementation over the
  * testdata tables plus (when SQL-expressible) a DuckDB oracle twin.
  *
  * Determinism contract shared by both sides (so the driver's
  * column-sorted value hash matches):
  *  - every output column is explicitly aliased, identically in both;
  *  - every query ends in a total ORDER BY (unique tie-break keys);
  *  - sums/averages over 2-decimal doubles go through DECIMAL(18,2)
  *    (order-independent exact arithmetic), then one cast to double;
  *  - ratios are `round(x, 6)`; raw timestamps are truncated to
  *    microseconds on the DuckDB side (`CAST(ts AS TIMESTAMP)`) to match
  *    Spark's parquet nanosecond→microsecond read semantics.
  */
final case class QDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle))

  /** Scratch dir for pipeline gates (staging + materialized output),
    * recursively deleted at JVM exit — the gate's result frame is read
    * lazily after the QDef returns, so eager deletion isn't possible, but
    * nothing may outlive the run (repeated Verify/Bench invocations must
    * not accumulate temp trees on the driver host).
    */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        val fs = f.listFiles()
        if (fs != null) fs.foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }
}
