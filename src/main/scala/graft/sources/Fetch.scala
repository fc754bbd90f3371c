package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side archive fetch — the reference's download step
  * (`download_from_cricsheet_lambda_function.py:40-59`: urllib fetch of
  * the Cricsheet zip to Lambda local disk before the S3 put). One small
  * driver HTTP stream is the right shape here: the archive is a single
  * tens-of-MB object, so there is nothing to distribute until
  * [[ZipSource]] expands its entries across executors. The destination
  * goes through the Hadoop FileSystem API, so the landing dir can be
  * any scheme (local, hdfs://, s3a://).
  */
object Fetch {

  /** Stream `url` (http(s)://, file://) to `<landingDir>/<basename>`;
    * returns the landed path. Overwrites an existing landing of the
    * same name (the weekly re-fetch semantics of the reference cron).
    */
  def toLanding(spark: SparkSession, url: String, landingDir: String): String = {
    val name = url.split('/').last
    require(name.nonEmpty, s"cannot derive a file name from $url")
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val dst = new Path(dir, name)
    val in = new java.net.URI(url).toURL.openStream()
    try {
      val out = fs.create(dst, true)
      try in.transferTo(out) finally out.close()
    } finally in.close()
    dst.toString
  }

  /** True for inputs [[toLanding]] should fetch rather than read.
    * (java.io.File.toURI renders file URLs with a single slash —
    * `file:/path` — so the authority part is optional.)
    */
  def isFetchUrl(s: String): Boolean =
    s.matches("^(https?|file):/.*")
}
