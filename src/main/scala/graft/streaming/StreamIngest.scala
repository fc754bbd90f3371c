package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.extract.Extractors
import graft.model.Cricsheet

/** Structured Streaming variant of ingest + extract.
  *
  * The reference's event plumbing (S3 object-created -> EventBridge ->
  * two Lambdas per file, 5-minute SQS delay as an ordering barrier)
  * collapses into a file-source stream: file arrival IS the event, the
  * checkpoint IS the DynamoDB ledger (exactly-once, no custom state),
  * and the two extraction branches run against one shared micro-batch
  * instead of re-reading the object per Lambda. maxFilesPerTrigger
  * reproduces the 10-file batch cap; Trigger.AvailableNow reproduces
  * the weekly catch-up run.
  */
object StreamIngest {

  /** Start an AvailableNow stream: landing JSONs -> matchwise +
    * deliverywise staging parquet. Returns the query (await it).
    */
  def run(spark: SparkSession, landingDir: String, stagingDir: String,
          checkpointDir: String, maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val raw = spark.readStream
      .schema(Cricsheet.schema)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(landingDir)
      .withColumn("match_id",
        regexp_extract(input_file_name(), "(\\d+)\\.json", 1).cast("int"))

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        // staging backend is config-pluggable (parquet by default,
        // s3a:// paths or a document-store connector via session conf)
        try {
          graft.core.Connectors.writeStaging(
            Extractors.matchwise(b), s"$stagingDir/matchwise")
          graft.core.Connectors.writeStaging(
            Extractors.deliverywise(b), s"$stagingDir/deliverywise")
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
