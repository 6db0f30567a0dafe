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
  import GraftExtensions.builders
  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[DotProductF].getName, name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (c => DotProductF(c(0), c(1))),
    // cosine = dot/(|a|·|b|) composed from the native dot (same fold order
    // as the Column API and the DuckDB oracle formulation)
    "graft_cosine" -> { c =>
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      Divide(DotProductF(c(0), c(1)),
        Multiply(Sqrt(DotProductF(c(0), c(0))), Sqrt(DotProductF(c(1), c(1)))))
    },
    // graft_table_ids(list_str[, sentinel]) — the X10 id-list parse
    "graft_table_ids" -> { c =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val sentinel = c.lift(1) match {
        case Some(Literal(v: Long, _)) => v
        case Some(Literal(v: Int, _)) => v.toLong
        case None => graft.etl.RedsetSchema.NullTableId
        case other => throw new IllegalArgumentException(
          s"graft_table_ids sentinel must be an integer literal, got $other")
      }
      graft.expr.ParseTableIds(c(0), sentinel)
    })

  /** Same registrations for an already-running session (extensions only
    * apply at construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
