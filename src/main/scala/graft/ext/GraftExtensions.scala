package graft.ext

import graft.expr.DotProductF
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT graft_dot(a, b)")` works next to the Column API.
  * Activate with `.config("spark.sql.extensions", "graft.ext.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductF(children(0), children(1))))
  }
}

object GraftExtensions {
  /** Same registrations for an already-running session (extensions only
    * apply at construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "graft_dot", children => DotProductF(children(0), children(1)))
}
