package graft.operators
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable exclusive prefix sum over a global order — the running-sum
  * sibling of [[SeqNumber]].
  *
  * `SUM(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` with no
  * partition clause funnels every row through one task; partitioning by
  * a low-cardinality stratum (5 languages) funnels it through 5. This
  * operator computes the same exclusive running sum with balanced
  * parallelism regardless of key skew:
  *
  *  1. range-repartition + local sort on the order key (as SeqNumber);
  *  2. localCheckpoint pins the partition assignment so both passes
  *     below see identical pids;
  *  3. per-partition totals (numPartitions rows) become cumulative
  *     offsets on the driver, re-attached by broadcast;
  *  4. the within-partition exclusive running sum is a window
  *     partitioned by pid — a balanced hash exchange over numPartitions
  *     keys, never a stratum-skew funnel.
  *
  * Requires a total order (include a unique tiebreak column) so the
  * running sum is well-defined.
  */
object PrefixSum {

  def withRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
                     name: String = "running_sum",
                     numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Integral contract: the offsets are exact longs; float/decimal
    // columns would need a different accumulation discipline (and a
    // getLong here would throw ClassCastException mid-job).
    val vType = df.schema(valueCol).dataType
    require(Seq("integer", "long", "short", "byte").contains(vType.typeName),
      s"withRunningSum requires an integral value column; $valueCol is $vType")
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .cpGuard()
    // sum(cast long) of an all-null or empty partition is null → 0
    val partTotals = sorted.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + partTotals.getOrElse(p, 0L))
    val offsetsDf = (0 until parts).map(p => (p, offsets(p))).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .withColumn("__lsum", coalesce(sum(col(valueCol)).over(w), lit(0L)))
      .join(broadcast(offsetsDf), "__pid")
      .withColumn(name, (col("__lsum") + col("__off")).cast("long"))
      .select(df.columns.map(col).toSeq :+ col(name): _*)
  }
}
