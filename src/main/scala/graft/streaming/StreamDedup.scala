package graft.streaming

import scala.util.Try
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ext.Dedup

/** Streaming near-duplicate detection: document batches arriving as
  * files are MinHash-deduplicated incrementally — each micro-batch
  * first against the accumulated corpus ([[Dedup.minhashDupAgainst]],
  * new-vs-corpus bands only), then within itself ([[Dedup.minhashDup]]),
  * and finally joins the corpus state. The dup-pair report accumulates
  * in `outDir`; the checkpoint is the ledger (a batch of files is
  * deduplicated exactly once across restarts).
  *
  * State is TWO append-only tables: the raw docs (texts, needed only
  * for exact verification of candidate docs) and the minhash BAND
  * table. Each batch bands ITSELF, probes the persisted band table,
  * and appends its own bands — per-batch work is O(batch), not
  * O(corpus) ([[Dedup.minhashDupAgainstBands]]). At cluster scale the
  * band table is what you'd bucket by (band_idx, band_key) so the
  * probe is co-partitioned.
  *
  * foreachBatch is AT-LEAST-ONCE: a crash after any write but before
  * the checkpoint commit replays the whole batch. Every write is
  * therefore keyed by batch id — `<table>/batch=<id>`, written with
  * overwrite — so a replay rewrites the same partition with the same
  * (deterministic, hash-derived) content instead of appending a second
  * copy; and the corpus state a batch probes is restricted to STRICTLY
  * EARLIER batches, so a replay never sees its own partial writes as
  * "corpus" (which would report every batch doc as its own duplicate).
  */
object StreamDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  def run(spark: SparkSession, landingDir: String, stateDir: String,
          outDir: String, checkpointDir: String,
          threshold: Double = 0.5): StreamingQuery = {
    val docs = spark.readStream.schema(docSchema)
      .option("multiLine", "false")
      .json(landingDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        processBatch(spark, batch0, batchId, stateDir, outDir, threshold)
      }
      .start()
  }

  /** One idempotent micro-batch step (public so a replay — the
    * at-least-once delivery of foreachBatch — can be exercised
    * directly in tests): dedup `batch0` against all state from batches
    * `< batchId`, then within itself, and overwrite this batch's
    * `batch=<batchId>` partition of the dup report, band table, and
    * doc table. Re-running with the same (batch, batchId) leaves all
    * three tables byte-identical.
    */
  def processBatch(spark: SparkSession, batch0: DataFrame, batchId: Long,
                   stateDir: String, outDir: String,
                   threshold: Double): Unit = {
    val batch = batch0.filter(col("doc_id").isNotNull).persist()
    try {
      val docsPath = s"$stateDir/docs"
      val bandsPath = s"$stateDir/bands"
      // state = strictly earlier batches only; a replayed batch must not
      // probe the partial writes of its own failed attempt. A state dir
      // written by the pre-batch-keyed layout has no `batch` partition
      // column: all of it was committed by completed batches, so it is
      // prior state wholesale (and must not crash column resolution).
      def priorState(path: String): Option[DataFrame] =
        Try(spark.read.parquet(path)).toOption.map { df =>
          if (df.columns.contains("batch"))
            df.filter(col("batch") < batchId).drop("batch")
          else df
        }
      val state = for {
        corpusDocs <- priorState(docsPath)
        corpusBands <- priorState(bandsPath)
      } yield (corpusDocs, corpusBands)
      val crossDups = state.map { case (corpusDocs, corpusBands) =>
        Dedup.minhashDupAgainstBands(corpusBands, corpusDocs, batch, threshold)
      }
      val intraDups = Dedup.minhashDup(batch, threshold)
      val all = crossDups.map(_.unionByName(intraDups)).getOrElse(intraDups)
      all.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      Dedup.minhashBands(Dedup.minhashSignatures(batch))
        .write.mode("overwrite").parquet(s"$bandsPath/batch=$batchId")
      batch.select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$docsPath/batch=$batchId")
    } finally {
      try batch.unpersist() catch { case NonFatal(_) => }
      ()
    }
  }
}
