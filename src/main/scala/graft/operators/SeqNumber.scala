package graft.operators
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable global sequence numbering.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition funnels every
  * row through ONE task — fine for a 3k-row publication table, fatal at
  * 100 TB. This operator gets the same dense 1..N numbering from a
  * range-repartition + per-partition sort + per-partition offsets,
  * entirely in Tungsten (no Row deserialization anywhere):
  *
  *  1. `repartitionByRange` samples the sort key and range-partitions;
  *  2. `sortWithinPartitions` sorts each partition locally;
  *  3. `monotonically_increasing_id()` yields (partitionId << 33) +
  *     local index (documented bit layout), from which the dense local
  *     index is recovered by subtracting the partition-id bits;
  *  4. a localCheckpoint pins the sorted data so the tiny counts job
  *     and the final pass share one materialization;
  *  5. per-partition counts (numPartitions rows — metadata-sized)
  *     become cumulative offsets, attached by a broadcast join.
  *
  * Limit: < 2^33 rows per partition (the id's local-index field), which
  * range partitioning keeps balanced anyway.
  */
object SeqNumber {

  def withSeq(df: DataFrame, order: Seq[Column], name: String = "seq",
              numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        monotonically_increasing_id() - shiftleft(col("__pid").cast("long"), 33))
      .cpGuard()
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val offsetsDf = (0 until parts).map(p => (p, offsets(p))).toDF("__pid", "__off")
    sorted.join(broadcast(offsetsDf), "__pid")
      .withColumn(name, (col("__local") + col("__off") + 1L).cast("long"))
      .select(df.columns.map(col).toSeq :+ col(name): _*)
  }
}
