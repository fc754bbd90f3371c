package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable global sequence numbering.
  *
  * `row_number() OVER (ORDER BY ...)` with no partition funnels every
  * row through ONE task — fine for a 3k-row publication table, fatal at
  * 100 TB. This operator gets the same dense 1..N numbering from a
  * range-repartition + per-partition sort + zipWithIndex: the range
  * exchange samples the sort key, each partition sorts locally, and
  * zipWithIndex assigns contiguous global indexes from per-partition
  * counts (one extra lightweight count job, no single-task stage).
  */
object SeqNumber {

  def withSeq(df: DataFrame, order: Seq[Column], name: String = "seq",
              numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val outSchema = sorted.schema.add(StructField(name, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
