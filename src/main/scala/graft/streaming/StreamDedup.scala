package graft.streaming

import scala.util.Try

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
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val batch = batch0.filter(col("doc_id").isNotNull).persist()
        try {
          val docsPath = s"$stateDir/docs"
          val bandsPath = s"$stateDir/bands"
          val state = for {
            corpusDocs <- Try(spark.read.parquet(docsPath)).toOption
            corpusBands <- Try(spark.read.parquet(bandsPath)).toOption
          } yield (corpusDocs, corpusBands)
          val crossDups = state.map { case (corpusDocs, corpusBands) =>
            Dedup.minhashDupAgainstBands(corpusBands, corpusDocs, batch, threshold)
          }
          val intraDups = Dedup.minhashDup(batch, threshold)
          val all = crossDups.map(_.unionByName(intraDups)).getOrElse(intraDups)
          all.write.mode("append").parquet(outDir)
          Dedup.minhashBands(Dedup.minhashSignatures(batch))
            .write.mode("append").parquet(bandsPath)
          batch.select(col("doc_id"), col("text"))
            .write.mode("append").parquet(docsPath)
        } finally { batch.unpersist(); () }
      }
      .start()
  }
}
