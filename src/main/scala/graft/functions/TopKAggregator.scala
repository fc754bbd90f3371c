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

  // Ordering matching Spark's `ORDER BY score DESC, id ASC` exactly,
  // including NaN: java.lang.Double.compare treats NaN as largest, so a
  // NaN score ranks FIRST under desc — same as row_number over a desc
  // window (a zero-norm embedding must land in the same slot either way).
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score)
      if (c != 0) c else java.lang.Long.compare(x.id, y.id)
    }
  }

  // The buffer stays UNSORTED and never exceeds k elements: each input
  // row is an O(k) scan-and-replace-worst, not an O(k log k) sort — at
  // billions of candidate rows the per-row sort is pure overhead. Order
  // is imposed once, in finish.
  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (k <= 0) b // top-0 is empty, not an IndexOutOfBounds on b(worst)
    else if (b.size < k) b :+ a
    else {
      var worst = 0
      var i = 1
      while (i < b.size) {
        if (ord.compare(b(i), b(worst)) > 0) worst = i
        i += 1
      }
      if (ord.compare(a, b(worst)) < 0) b.updated(worst, a) else b
    }
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    y.foldLeft(x)(reduce)
  override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(ord)
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
