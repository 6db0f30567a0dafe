package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass parser behind [[ParseTableIds]] — one static method so the
  * generated code is a plain call, no lambda machinery.
  */
object TableIdParser {

  /** Parse a bracketed comma-separated id list ("[ 12, 999999, x ]") into
    * the valid ids, dropping the sentinel, malformed tokens, and empties.
    *
    * Exactly the composed semantics of
    * `filter(transform(split(regexp_replace(c, "[\\[\\]\\s]", ""), ","),
    * s => nullif-sentinel(try_cast(s as long))), notNull)`:
    *  - '[' ']' and Java-regex `\s` chars ([ \t\n\f\r]) are stripped
    *    BEFORE tokenizing, so "1 2" merges to 12 just as regexp_replace does;
    *  - tokens split on ',' (empties dropped — try_cast("") is null);
    *  - a token is valid iff optional sign + ASCII digits and fits in a
    *    long (ANSI try_cast semantics; `Character.digit`-style Unicode
    *    digits are rejected like ANSI does);
    *  - sentinel-valued ids are dropped (F8: the reference's 999999 open
    *    marker, update_tables.py:214,224).
    */
  def parse(s: UTF8String, sentinel: Long): ArrayData = {
    val str = s.toString
    val n = str.length
    val buf = new scala.collection.mutable.ArrayBuffer[Long](4)
    val sb = new java.lang.StringBuilder(20)
    def flush(): Unit = {
      val len = sb.length()
      if (len > 0) {
        var j = 0
        val c0 = sb.charAt(0)
        if (c0 == '+' || c0 == '-') j = 1
        var ok = j < len
        var k = j
        while (ok && k < len) {
          val c = sb.charAt(k)
          if (c < '0' || c > '9') ok = false
          k += 1
        }
        if (ok) {
          try {
            val v = java.lang.Long.parseLong(sb, 0, len, 10)
            if (v != sentinel) buf += v
          } catch { case _: NumberFormatException => () } // overflow → null → dropped
        }
      }
      sb.setLength(0)
    }
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      if (ch == ',') flush()
      else if (ch == '[' || ch == ']' || ch == ' ' || ch == '\t' ||
               ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r') ()
      else sb.append(ch)
      i += 1
    }
    flush()
    new GenericArrayData(buf.toArray)
  }
}

/** Codegen'd table-id list parse (X10 hot path). The HOF formulation is
  * semantically identical but `transform`/`filter` lambdas evaluate outside
  * whole-stage codegen AND drag the whole upstream projection feeding them
  * into interpreted mode — measured at ~2.5x the entire clean+flatten
  * chain's cost. This stays inside the codegen span: the generated code is
  * one static call per row.
  */
case class ParseTableIds(child: Expression, sentinel: Long)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_table_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TableIdParser.parse(input.asInstanceOf[UTF8String], sentinel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TableIdParser.parse($c, ${sentinel}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TableIdExpressions {
  /** Valid non-sentinel ids of a bracketed comma-separated list column. */
  def tableIds(c: Column, sentinel: Long): Column =
    Bridge.column(ParseTableIds(Bridge.expression(c), sentinel))
}
