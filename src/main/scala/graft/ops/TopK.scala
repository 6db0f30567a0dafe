package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** O6: bounded streaming top-k as a custom typed Aggregator — the principled
  * replacement for the reference's insert-sorted deque capped at
  * MAX_MESSAGES (`Dashboard/ddb_wrappers.py:355-379`).
  *
  * The buffer never exceeds k elements, so partial aggregation ships k rows
  * per partition over the wire (vs. a full sort's n log n shuffle). For the
  * batch path Spark's own TakeOrderedAndProject (orderBy.limit) is already
  * optimal — this Aggregator exists for streaming/grouped use where that
  * operator can't apply.
  */
object TopK {

  case class Scored(value: Double, id: Long)

  /** Descending by value, ascending id tie-break — total order. */
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.value, s.id))

  class BoundedTopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
      if (b.size < k) (b :+ a).sorted(ord)
      else if (ord.lt(a, b.last)) (b.init :+ a).sorted(ord)
      else b
    }
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
