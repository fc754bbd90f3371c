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
                     numPartitions: Option[Int] = None): DataFrame =
    withRunningSums(df, order, Seq(valueCol -> name), None, numPartitions)

  /** Several exclusive running sums (and optionally a dense 1..N
    * sequence number) over the SAME total order in ONE range-partition
    * + sort + materialization + driver collect. Composing
    * [[withRunningSum]] / [[SeqNumber.withSeq]] calls pays that
    * four-job pipeline once PER CALL over identical data in an
    * identical order — the Pettitt/KS statistics chained two to three
    * of them back to back. Per-partition totals and row counts ride
    * one aggregation row; each output column's definition is exactly
    * the single-column operator's.
    */
  def withRunningSums(df: DataFrame, order: Seq[Column],
                      cols: Seq[(String, String)],
                      seqName: Option[String] = None,
                      numPartitions: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty || seqName.nonEmpty, "nothing to compute")
    val spark = df.sparkSession
    import spark.implicits._
    // Integral contract: the offsets are exact longs; float/decimal
    // columns would need a different accumulation discipline (and a
    // getLong here would throw ClassCastException mid-job).
    cols.foreach { case (valueCol, _) =>
      val vType = df.schema(valueCol).dataType
      require(Seq("integer", "long", "short", "byte").contains(vType.typeName),
        s"withRunningSums requires integral value columns; $valueCol is $vType")
    }
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted0 = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
    val sorted = seqName.fold(sorted0)(_ => sorted0
      // (partitionId << 33) + local index (documented bit layout) —
      // the SeqNumber dense-local-index recovery
      .withColumn("__local", monotonically_increasing_id()
        - shiftleft(col("__pid").cast("long"), 33)))
      .cpGuard()
    // sum(cast long) of an all-null or empty partition is null → 0
    val aggs = cols.zipWithIndex.map { case ((v, _), j) =>
      coalesce(sum(col(v).cast("long")), lit(0L)).as(s"__t$j")
    } ++ seqName.map(_ => count(lit(1)).as("__c"))
    val partRows = sorted.groupBy(col("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getInt(0) ->
        (1 until r.length).map(r.getLong).toIndexedSeq).toMap
    val zero = IndexedSeq.fill(aggs.size)(0L)
    val offsets = (0 until parts).scanLeft(zero) { (acc, p) =>
      val t = partRows.getOrElse(p, zero)
      acc.indices.map(j => acc(j) + t(j)).toIndexedSeq
    }
    val offCols = cols.indices.map(j => s"__off$j") ++
      seqName.map(_ => "__coff")
    val offsetsDf = (0 until parts).map(p => (p, offsets(p).toSeq))
      .toDF("__pid", "__offs")
      .select(col("__pid") +: offCols.zipWithIndex.map { case (n, j) =>
        element_at(col("__offs"), j + 1).as(n)
      }: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = cols.zipWithIndex.foldLeft(
      sorted.join(broadcast(offsetsDf), "__pid")) { case (d, ((v, _), j)) =>
      d.withColumn(s"__lsum$j",
        coalesce(sum(col(v)).over(w), lit(0L)))
    }
    val outCols = cols.zipWithIndex.map { case ((_, name), j) =>
      (col(s"__lsum$j") + col(s"__off$j")).cast("long").as(name)
    } ++ seqName.map(n =>
      (col("__local") + col("__coff") + 1L).cast("long").as(n))
    local.select(df.columns.map(col).toSeq ++ outCols: _*)
  }

  /** EXCLUSIVE running maximum over a global order — the high-water-
    * mark sibling of [[withRunningSum]], same two-pass shape: range
    * partition + local sort, per-partition maxes to the driver
    * (numPartitions values), exclusive prefix maxes re-attached by
    * broadcast, within-partition exclusive running max windowed by
    * pid. The result column is null for the globally first row (no
    * predecessor — an empty max, not a sentinel). This is the
    * distributed form of `MAX(x) OVER (ORDER BY ... ROWS UNBOUNDED
    * PRECEDING AND 1 PRECEDING)` that a watermark/late-data audit
    * needs without funneling the stream through one task.
    */
  def withRunningMax(df: DataFrame, order: Seq[Column], valueCol: String,
                     name: String = "running_max",
                     numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vType = df.schema(valueCol).dataType
    require(Seq("integer", "long", "short", "byte").contains(vType.typeName),
      s"withRunningMax requires an integral value column; $valueCol is $vType")
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .cpGuard()
    val partMaxes = sorted.groupBy(col("__pid"))
      .agg(max(col(valueCol).cast("long")).as("m"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // exclusive prefix max of the partition maxes (None = no rows yet)
    val prefixes = (0 until parts).scanLeft(Option.empty[Long]) {
      (acc, p) =>
        (acc.toSeq ++ partMaxes.getOrElse(p, None).toSeq)
          .reduceOption(math.max(_: Long, _: Long))
    }
    val offsetsDf = (0 until parts)
      .map(p => (p, prefixes(p).map(java.lang.Long.valueOf).orNull))
      .toDF("__pid", "__pmax")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted
      .withColumn("__lmax", max(col(valueCol).cast("long")).over(w))
      .join(broadcast(offsetsDf), "__pid")
      // greatest skips nulls (null only when BOTH prefixes are empty —
      // exactly the globally-first-row case)
      .withColumn(name, greatest(col("__lmax"), col("__pmax")))
      .select(df.columns.map(col).toSeq :+ col(name): _*)
  }
}
