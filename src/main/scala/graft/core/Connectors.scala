package graft.core

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Config-driven staging connectors.
  *
  * The reference stages through managed services — S3 object puts
  * (reference `aws/lambda_functions/download_from_cricsheet_lambda_function.py:114-118`)
  * and MongoDB collections
  * (`extract_matchwise_data_lambda_function.py:107`,
  * `convert_mongo_db_data_to_csv_lambda.py:39,50`). In Spark both are
  * just DataSource formats + options, so the engine keeps ONE staging
  * code path and swaps the backend by session config:
  *
  *   - `spark.graft.staging.format`    — DataSource short name
  *     (default `parquet`; e.g. `json`, `orc`, or a connector such as
  *     `mongodb` when its jar is on the classpath)
  *   - `spark.graft.staging.option.*`  — passed through to the
  *     reader/writer (e.g. `spark.graft.staging.option.connection.uri`
  *     for the MongoDB connector).
  *
  * Path-addressed formats receive the staging target as a path — any
  * Hadoop FileSystem scheme works (`file://`, `hdfs://`, `s3a://` with
  * hadoop-aws on the classpath), same as every other path in the
  * engine. Store-addressed connectors (no path concept) receive the
  * target's last segment as the `collection` option instead, mirroring
  * the reference's per-dataset Mongo collections.
  */
object Connectors {
  val FormatKey = "spark.graft.staging.format"
  val OptionPrefix = "spark.graft.staging.option."

  /** Formats addressed by a filesystem path (vs. by collection). */
  private val pathBased = Set("parquet", "json", "csv", "orc", "text", "avro")

  def stagingFormat(spark: SparkSession): String =
    spark.conf.getOption(FormatKey).getOrElse("parquet")

  def stagingOptions(spark: SparkSession): Map[String, String] =
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith(OptionPrefix) =>
        k.stripPrefix(OptionPrefix) -> v
    }

  private def collectionOf(target: String): String =
    target.split('/').filter(_.nonEmpty).last

  def writeStaging(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val fmt = stagingFormat(spark)
    val w = df.write.format(fmt).options(stagingOptions(spark)).mode("append")
    if (pathBased(fmt)) w.save(target)
    else w.option("collection", collectionOf(target)).save()
  }

  def readStaging(spark: SparkSession, target: String): DataFrame = {
    val fmt = stagingFormat(spark)
    val r: DataFrameReader =
      spark.read.format(fmt).options(stagingOptions(spark))
    if (pathBased(fmt)) r.load(target)
    else r.option("collection", collectionOf(target)).load()
  }
}
