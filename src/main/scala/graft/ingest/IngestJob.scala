package graft.ingest
import graft.core.PlanCapture.CheckpointOps

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ingest: the reference's download-lambda dataflow
  * (download_from_cricsheet_lambda_function.py:77-118) minus the HTTP
  * fetch (out-of-engine). landing files − ledger → cap N → stage →
  * ledger append.
  *
  * The DynamoDB status table becomes a plain parquet ledger keyed by
  * file_name; "only new files" is a left_anti join against it. The
  * reference processes files in nondeterministic os.walk order — we
  * impose orderBy(file_name) so the cap is reproducible.
  *
  * The two per-stage extraction flags are modeled as the reference
  * models them (utils.py:74-89 — one DynamoDB update_item per field):
  * [[run]] creates each staged file's row with both flags FALSE, and
  * each stage marks ITS OWN column via [[markStage]] when it completes
  * — so a stage failure-then-retry is representable (one flag true,
  * the other still false), not collapsed into a single both-true
  * append.
  */
object IngestJob {

  val DefaultLimit = 10 // aws/constants.py:3

  /** utils.py:74's `field` values, as the reference names them. */
  val MatchwiseStatus = "matchwise_data_extraction_status"
  val DeliverywiseStatus = "deliverywise_data_extraction_status"

  def ledger(spark: SparkSession, ledgerDir: String): DataFrame = {
    val p = new Path(ledgerDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(ledgerDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_name",
          org.apache.spark.sql.types.StringType))))
  }

  /** Landing-dir *.json names minus already-ledgered ones, capped.
    *
    * Discovery is a DISTRIBUTED binaryFile scan of names (content
    * column never selected, so no bytes are read): Spark's parallel
    * partition discovery spreads the listing RPCs across executors
    * once the dir crosses the parallelism threshold, the anti-join
    * runs as a plan, and only the capped `limit` names are collected
    * (TakeOrdered). A million-file landing dir never funnels through
    * a driver-side listStatus array + local set difference.
    */
  def newFiles(spark: SparkSession, landingDir: String, ledgerDir: String,
               limit: Int = DefaultLimit): Seq[String] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(landingDir)
      .select(substring_index(col("path"), "/", -1).as("file_name"))
      .join(ledger(spark, ledgerDir).select("file_name"),
        Seq("file_name"), "left_anti")
      .orderBy(col("file_name"))
      .limit(limit)
      .as[String].collect().toSeq
  }

  /** Upsert `field := status` for `files`, keyed by file_name — the
    * engine twin of the reference's per-field DynamoDB update_item.
    * Rows absent from the ledger are created with every other column
    * null; existing rows keep their other columns untouched. The
    * ledger is one row per ingested file (metadata-sized, not
    * data-sized), so the read-merge-overwrite rewrite is bounded at
    * any corpus scale; the pre-merge state is pinned (localCheckpoint)
    * before the overwrite so the write never reads its own target.
    */
  def markStage(spark: SparkSession, ledgerDir: String, files: Seq[String],
                field: String, status: Boolean = true): Unit = {
    import spark.implicits._
    require(field == MatchwiseStatus || field == DeliverywiseStatus,
      s"unknown ledger stage field: $field")
    if (files.isEmpty) return
    val cur = Seq(MatchwiseStatus, DeliverywiseStatus)
      .foldLeft(ledger(spark, ledgerDir)) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast("boolean"))
      }
    val merged = cur
      .join(files.toDF("file_name").withColumn("__hit", lit(true)),
        Seq("file_name"), "full_outer")
      .withColumn(field, when(col("__hit"), lit(status)).otherwise(col(field)))
      .drop("__hit")
      .cpGuard()
    merged.write.mode(SaveMode.Overwrite).parquet(ledgerDir)
  }

  /** Copy the capped new files into staging and ledger them with both
    * stage flags false (staged-but-not-yet-extracted — presence alone
    * excludes them from the next run's anti-join). Idempotent by
    * construction: a re-run sees them in the ledger and copies nothing
    * (the reference instead crashes on Mongo duplicate _id — a
    * deliberate divergence, documented in SURVEY §7).
    */
  def run(spark: SparkSession, landingDir: String, stagingDir: String,
          ledgerDir: String, limit: Int = DefaultLimit): Seq[String] = {
    import spark.implicits._
    val files = newFiles(spark, landingDir, ledgerDir, limit)
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(landingDir); val dst = new Path(stagingDir)
    val fs = src.getFileSystem(conf)
    fs.mkdirs(dst)
    files.foreach { f =>
      FileUtil.copy(fs, new Path(src, f), fs, new Path(dst, f), false, conf)
    }
    if (files.nonEmpty)
      files.toDF("file_name")
        .withColumn(MatchwiseStatus, lit(false))
        .withColumn(DeliverywiseStatus, lit(false))
        .write.mode(SaveMode.Append).parquet(ledgerDir)
    files
  }
}
