package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** (id, score) pair for top-k aggregation. Field order matters: udaf
  * callers pass (id_col, score_col) positionally.
  */
case class Scored(id: Long, score: Double)

/** Typed top-k-by-score Aggregator: keeps the k best (score desc, id
  * asc — fully deterministic, double scores compared exactly) per
  * group. This is the map-side-combining alternative to
  * row_number-over-window top-k: each partition keeps only k rows per
  * group before the shuffle, so at 100 TB the exchange carries
  * O(groups x k) rows instead of every scored candidate.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
  override def finish(b: Seq[Scored]): Seq[Scored] = trim(b)
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped column form: top_k(id_col, score_col) -> array<struct<id,score>>. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
    (id, score) => fn(id, score)
  }
}
