package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftglue.ColumnGlue

/** Native as-of join: the full custom-operator stack (LogicalPlan +
  * Strategy + SparkPlan), SURVEY §2.6 preference order (c).
  *
  * Semantics are identical to [[graft.operators.AsOfJoin.lastBefore]]
  * (latest right row with the same key and right.ts <= left.ts), but
  * the physical plan is a co-partitioned, co-sorted single-pass merge:
  * EnsureRequirements hash-partitions both sides on the key and sorts
  * within partitions by (key, ts); the exec then streams both iterators
  * once, carrying only the latest matching payload — no window state,
  * no union materialization. The union+window formulation shuffles the
  * combined stream; this one shuffles each side once and merges.
  *
  * Key must be LongType-compatible and ts TimestampType (micros);
  * that covers the engine's event/entity tables.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression,
                        payload: Seq[Attribute]) extends BinaryNode {
  // payload attrs are raw right-side attributes (CleanupAliases strips
  // Alias inside non-Project operators); renaming happens in a Project
  // that AsOfJoinNative.lastBefore puts on top
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, leftTs: Expression,
                        rightKey: Expression, rightTs: Expression,
                        payload: Seq[Attribute],
                        override val output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] = {
    // pin the partition count: zipPartitions needs both sides hashed
    // into IDENTICAL partitions, and AQE must not coalesce the two
    // shuffles differently
    val n = Some(conf.numShufflePartitions)
    Seq(ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n),
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n))
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTs = Seq(leftKey, leftTs)
    val rKeyTs = Seq(rightKey, rightTs)
    val payloadExprs = payload
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(
        lKeyTs.map(BindReferences.bindReference(_, leftOut)))
      val rProj = UnsafeProjection.create(
        rKeyTs.map(BindReferences.bindReference(_, rightOut)))
      val payloadProj = UnsafeProjection.create(
        payloadExprs.map(BindReferences.bindReference[Expression](_, rightOut)))
      val nullPayload = new GenericInternalRow(payloadExprs.size)
      val joiner = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      val rBuf = rIter.buffered
      var matchKeyValid = false
      var matchKey = 0L
      var matchPayload: InternalRow = null

      lIter.map { lRow =>
        val lkt = lProj(lRow)
        if (lkt.isNullAt(0)) {
          resultProj(joiner(lRow, nullPayload))
        } else {
          val lk = lkt.getLong(0)
          val lt = if (lkt.isNullAt(1)) Long.MinValue else lkt.getLong(1)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkt = rProj(rBuf.head)
            if (rkt.isNullAt(0)) { rBuf.next(); () }
            else {
              val rk = rkt.getLong(0)
              val rt = if (rkt.isNullAt(1)) Long.MinValue else rkt.getLong(1)
              if (rk < lk || (rk == lk && rt <= lt)) {
                val rRow = rBuf.next()
                if (rk == lk) {
                  matchKeyValid = true; matchKey = lk
                  matchPayload = payloadProj(rRow).copy()
                }
              } else advancing = false
            }
          }
          val p = if (matchKeyValid && matchKey == lk) matchPayload else nullPayload
          resultProj(joiner(lRow, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.payload, j.output) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** Register the planner strategy on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy.type]))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** As-of join via the native operator; same contract as
    * [[graft.operators.AsOfJoin.lastBefore]].
    */
  def lastBefore(left: DataFrame, right: DataFrame, key: String, ts: String,
                 payload: Seq[String], asOfPrefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = ColumnGlue.planOf(left)
    // re-alias the right side so its attributes get fresh exprIds: both
    // sides often derive from the same scan (self-as-of), and shared
    // ids would confuse column pruning across the custom node
    val rFresh = right.select(right.columns.toSeq
      .map(c => right.col(c).alias(c)): _*)
    val rPlan = ColumnGlue.planOf(rFresh)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val payloadAttrs = (ts +: payload).map(p => attr(rPlan, p))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts), attr(rPlan, key), attr(rPlan, ts),
      payloadAttrs)
    val renamed = org.apache.spark.sql.catalyst.plans.logical.Project(
      lPlan.output.map(a => a: NamedExpression) ++
        payloadAttrs.map(a => Alias(a, s"$asOfPrefix${a.name}")()),
      node)
    ColumnGlue.ofRows(spark, renamed)
  }
}
