package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Cricsheet

/** Distributed zip expansion (SURVEY S1/S2): the reference downloads
  * the Cricsheet archive and extracts it on Lambda local disk; here
  * each zip is one `binaryFile` row and its entries are expanded
  * per-partition in executor memory — no local-disk staging, and many
  * archives expand in parallel. A whole archive must fit in executor
  * memory (the Cricsheet zip is tens of MB; for multi-GB archives
  * split upstream or stream per-entry).
  */
object ZipSource {

  /** (zip_path, entry, text) for every file entry matching `suffix`. */
  def readEntries(spark: SparkSession, path: String,
                  suffix: String = ".json"): DataFrame =
    expandEntries(spark.read.format("binaryFile").load(path), suffix)

  /** Expand a (path, content) DataFrame of zip payloads — works on a
    * batch binaryFile scan and equally on a streaming micro-batch
    * (StreamIngest.runZip), which is what keeps the zip→publish chain
    * a single code path in both modes.
    */
  def expandEntries(files: DataFrame, suffix: String = ".json"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (zipPath, bytes) =>
        val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
        // A corrupt archive must not kill the whole ingest job: salvage
        // the entries decoded before the corruption and move on (the
        // engine's malformed-input contract — null/absent rows, never
        // job failure).
        try {
          var e = zis.getNextEntry
          while (e != null) {
            if (!e.isDirectory && e.getName.endsWith(suffix)) {
              out += ((zipPath, e.getName,
                new String(zis.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
            }
            e = zis.getNextEntry
          }
        } catch {
          case ex: java.io.IOException =>
            System.err.println(
              s"[zip-source] corrupt archive $zipPath: ${ex.getMessage}; " +
                s"salvaged ${out.size} entr${if (out.size == 1) "y" else "ies"}")
        }
        out
      }
      .toDF("zip_path", "entry", "text")
  }

  /** Cricsheet matches parsed straight out of the archive: same shape
    * as [[Cricsheet.read]] over an exploded directory (match_id from
    * the entry name), so the extractors run unchanged.
    */
  def readMatches(spark: SparkSession, zipPath: String): DataFrame =
    matchesFrom(readEntries(spark, zipPath))

  /** Parse expanded entries into the [[Cricsheet.read]] shape. */
  def matchesFrom(entries: DataFrame): DataFrame = {
    val idStr = regexp_extract(col("entry"), "(\\d+)\\.json", 1)
    entries
      .withColumn("parsed", from_json(col("text"), Cricsheet.schema))
      .select(
        col("parsed.meta").as("meta"),
        col("parsed.info").as("info"),
        col("parsed.innings").as("innings"),
        when(idStr =!= "", idStr.cast("int")).as("match_id"))
  }
}
