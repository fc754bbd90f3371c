package graft.ingest

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
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
  */
object IngestJob {

  val DefaultLimit = 10 // aws/constants.py:3

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

  /** Landing-dir *.json names minus already-ledgered ones, capped. */
  def newFiles(spark: SparkSession, landingDir: String, ledgerDir: String,
               limit: Int = DefaultLimit): Seq[String] = {
    import spark.implicits._
    val p = new Path(landingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".json")).toSeq
    names.toDF("file_name")
      .join(ledger(spark, ledgerDir).select("file_name"), Seq("file_name"), "left_anti")
      .orderBy(col("file_name"))
      .limit(limit)
      .as[String].collect().toSeq
  }

  /** Copy the capped new files into staging and mark them processed.
    * Idempotent by construction: a re-run sees them in the ledger and
    * copies nothing (the reference instead crashes on Mongo duplicate
    * _id — a deliberate divergence, documented in SURVEY §7).
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
        .withColumn("matchwise_data_extraction_status", lit(true))
        .withColumn("deliverywise_data_extraction_status", lit(true))
        .write.mode(SaveMode.Append).parquet(ledgerDir)
    files
  }
}
