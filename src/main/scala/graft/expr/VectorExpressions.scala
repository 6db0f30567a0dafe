package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding hot path (SURVEY §7.2 step
  * 8 / similarity search). The HOF formulation
  * (`aggregate(zip_with(...))`) is semantically identical but evaluates
  * per-element lambdas outside whole-stage codegen; these generate a tight
  * primitive loop instead — same strict left-to-right double accumulation,
  * so results are bit-identical to the HOF fold and the DuckDB oracle.
  *
  * The custom-Expression surface is deliberately tiny — this dot product
  * and [[ParseTableIds]] (the X10 id-list parse), both motivated by the
  * same measured HOF-interpretation cliff; everything else is expressible
  * with built-ins at full codegen speed (SURVEY §4).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Element type is resolved at analysis time: float and double vectors are
  // both supported (the SQL-registered form sees array<double> literals);
  // anything else — or a float/double mix — is an analysis error, never a
  // silent misread of the underlying bytes.
  private def elementTypes: Option[(DataType, DataType)] =
    (left.dataType, right.dataType) match {
      case (ArrayType(l @ (FloatType | DoubleType), _),
            ArrayType(r @ (FloatType | DoubleType), _)) => Some((l, r))
      case _ => None
    }

  override def checkInputDataTypes(): TypeCheckResult = elementTypes match {
    case Some((l, r)) if l == r => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.$getter($i) * (double) $y.$getter($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd float/double-vector dot product (strict left fold, double acc). */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))
}
