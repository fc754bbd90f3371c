package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ext.Dedup

/** Streaming distinct-count sketch: each micro-batch of user events
  * reduces to ONE HyperLogLog register table (2^p longs — the whole
  * per-batch state, whatever the batch size), persisted under an
  * idempotent `batch=<id>` partition exactly like
  * [[StreamDedup]]'s band state; the live estimate is the per-bucket
  * MAX over all batches — the register-merge identity the d18 oracle
  * proves value-for-value. This is the streaming shape of "how many
  * distinct users ever": state grows by 2 KB per batch (p=8) instead
  * of per user, merges associatively, and a replayed batch (foreachBatch
  * is at-least-once) rewrites its own partition with identical
  * registers, then the snapshot recomputes to the same estimate.
  */
object StreamSketch {

  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", LongType)))

  def run(spark: SparkSession, landingDir: String, stateDir: String,
          checkpointDir: String, p: Int = 8): StreamingQuery = {
    val events = spark.readStream.schema(eventSchema)
      .option("multiLine", "false")
      .json(landingDir)
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, stateDir, p)
      }
      .start()
  }

  /** One idempotent micro-batch step (public for replay tests):
    * overwrite this batch's register partition, then refresh the
    * one-row estimate snapshot from ALL batches' registers.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   stateDir: String, p: Int): Unit = {
    Dedup.hllRegisters(batch.filter(col("user_id").isNotNull),
        col("user_id"), p)
      .write.mode("overwrite").parquet(s"$stateDir/regs/batch=$batchId")
    val merged = spark.read.parquet(s"$stateDir/regs")
      .groupBy(col("bucket")).agg(max(col("m_rho")).as("m_rho"))
    Dedup.hllEstimate(merged, p)
      .write.mode("overwrite").parquet(s"$stateDir/estimate")
  }
}
