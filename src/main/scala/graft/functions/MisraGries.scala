package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A reported heavy-hitter candidate: token and its DETERMINISTIC
  * lower-bound estimate of the true count.
  */
case class TokEst(tok: String, est: Long)

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982) as a typed
  * mergeable Aggregator — the deterministic-guarantee counterpart to
  * the probabilistic Count-Min sketch (t09): with k counters, after any
  * sequence of reduces AND any merge tree,
  *
  *   true - n/(k+1)  <=  est  <=  true
  *
  * for every token (n = stream length), so every token with true
  * frequency above n/(k+1) is GUARANTEED present in the summary —
  * no hash collisions, no failure probability.
  *
  * Mergeability is the property that makes the sketch distributable
  * (Agarwal et al., "Mergeable Summaries", PODS'12): partitions build
  * local summaries map-side, and `merge` combines two k-counter
  * summaries into one k-counter summary WITHOUT losing the bound — sum
  * counts, then subtract the (k+1)-th largest combined count from all
  * and drop the non-positive. The exchange therefore carries O(k) rows
  * per partition instead of the full token stream — the same
  * map-side-combine shape as [[TopKAggregator]].
  *
  * The survivor SET below the heavy threshold may depend on partition
  * merge order (inherent to MG); the guarantees above hold for every
  * order, which is exactly what the t20 audit checks.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[TokEst]] {
  require(k > 0, "k counters, k > 0")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None =>
        // table full: decrement every counter (the arriving token's
        // single occurrence is absorbed by the same decrement event —
        // k+1 occurrences retire together, hence the n/(k+1) bound)
        b.iterator.collect { case (t, c) if c > 1 => t -> (c - 1) }.toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(k)(x, y)

  override def finish(b: Map[String, Long]): Seq[TokEst] =
    b.toSeq.sortBy(_._1).map { case (t, c) => TokEst(t, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TokEst]] = ExpressionEncoder()
}

/** Merge-only MG aggregation: folds already-built summaries (rows of
  * (tok, est), e.g. one persisted summary per micro-batch) into one
  * k-counter summary. Piecewise singleton merges form just another
  * merge tree, so the PODS'12 bound holds for the combined stream —
  * this is what lets [[graft.streaming.StreamSketch]] keep O(k) state
  * per batch and still serve a globally-bounded heavy-hitter set.
  */
class MisraGriesMergeAggregator(k: Int)
    extends Aggregator[TokEst, Map[String, Long], Seq[TokEst]] {
  require(k > 0, "k counters, k > 0")
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], e: TokEst): Map[String, Long] =
    MisraGries.mergeSummaries(k)(b, Map(e.tok -> e.est))
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeSummaries(k)(x, y)
  override def finish(b: Map[String, Long]): Seq[TokEst] =
    b.toSeq.sortBy(_._1).map { case (t, c) => TokEst(t, c) }
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TokEst]] = ExpressionEncoder()
}

object MisraGries {
  /** Merge two k-counter summaries (Agarwal et al. PODS'12): sum
    * counts, then subtract the (k+1)-th largest combined count from
    * all and drop the non-positive — at most k survive, and each
    * token's estimate drops by at most the cut, so the total error
    * over any merge tree stays within n/(k+1).
    */
  def mergeSummaries(k: Int)(x: Map[String, Long],
                             y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cs = sum.valuesIterator.toArray
      java.util.Arrays.sort(cs)
      val cut = cs(cs.length - (k + 1)) // (k+1)-th largest
      sum.iterator.collect { case (t, c) if c > cut => t -> (c - cut) }.toMap
    }
  }

  /** Untyped column form: heavy_hitters(tok_col) -> array<struct<tok,est>>. */
  def heavyHitters(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]())
    tok => fn(tok)
  }

  /** Untyped merge form: merge_summaries(tok_col, est_col) over
    * persisted summary rows -> array<struct<tok,est>>.
    */
  def mergeHeavyHitters(k: Int): (Column, Column) => Column = {
    val fn = udaf(new MisraGriesMergeAggregator(k), ExpressionEncoder[TokEst]())
    (tok, est) => fn(tok, est)
  }
}
