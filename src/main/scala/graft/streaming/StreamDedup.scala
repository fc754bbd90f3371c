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
  * State here is the raw docs table (re-banded per batch — correct and
  * simple); the at-scale refinement is persisting the BAND table
  * bucketed by (band_idx, band_key) so each batch probes it with a
  * co-partitioned join and appends its own bands, which
  * [[Dedup.minhashDupAgainst]]'s shape already supports (the corpus
  * side is one band-equi-join probe away). Doc texts must still be
  * retrievable for exact-Jaccard verification either way.
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
          val statePath = s"$stateDir/docs"
          val corpus = Try(spark.read.parquet(statePath)).toOption
          val crossDups = corpus match {
            case Some(c) => Dedup.minhashDupAgainst(c, batch, threshold)
            case None => None.orNull
          }
          val intraDups = Dedup.minhashDup(batch, threshold)
          val all = Option(crossDups)
            .map(_.unionByName(intraDups)).getOrElse(intraDups)
          all.write.mode("append").parquet(outDir)
          batch.select(col("doc_id"), col("text"))
            .write.mode("append").parquet(statePath)
        } finally { batch.unpersist(); () }
      }
      .start()
  }
}
