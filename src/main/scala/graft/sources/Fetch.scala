package graft.sources

import scala.util.control.NonFatal

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
    *
    * The landing is ATOMIC: bytes stream to a `._tmp.`-prefixed name
    * and rename into place only once fully written. A streaming reader
    * polling the landing dir (StreamIngest.runZip globs `*.zip`) must
    * never observe a half-copied archive — its checkpoint would mark
    * the truncated file processed forever. The temp prefix is the
    * documented contract for the landing dir: anything else writing
    * into it must also write-then-rename (or use a non-matching
    * suffix while in flight).
    */
  def toLanding(spark: SparkSession, url: String, landingDir: String): String = {
    val name = url.split('/').last
    require(name.nonEmpty, s"cannot derive a file name from $url")
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(landingDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val dst = new Path(dir, name)
    val tmp = new Path(dir, s"._tmp.${java.util.UUID.randomUUID()}.$name")
    val in = new java.net.URI(url).toURL.openStream()
    try {
      val out = fs.create(tmp, true)
      try in.transferTo(out) finally out.close()
      // rename WITH overwrite semantics: a delete-then-rename pair
      // would lose the previous good landing if the rename failed
      // between the two steps — the old archive must survive until the
      // new one is in place. FileContext needs an AbstractFileSystem
      // binding for the scheme (fs.AbstractFileSystem.<scheme>.impl);
      // schemes without one (some s3a builds/configs) fall back to the
      // FileSystem delete+rename pair — rename isn't atomic on object
      // stores anyway, so the fallback gives up nothing there
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, conf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // No OVERWRITE rename for this scheme; a bare delete+rename
          // would reopen the crash window the FileContext path exists to
          // close (old good archive gone, new one not yet in place).
          // Move the old landing ASIDE instead — `._bak.` also doesn't
          // match the landing glob — swap the new one in, then drop the
          // backup; on a failed swap-in the backup is restored.
          val bak = new Path(dir, s"._bak.$name")
          fs.delete(bak, false)
          val hadPrior = fs.exists(dst) && fs.rename(dst, bak)
          def restore(): Unit =
            if (hadPrior) { try fs.rename(bak, dst) catch { case NonFatal(_) => }; () }
          val swapped = try fs.rename(tmp, dst) catch {
            case NonFatal(ex) => restore(); throw ex
          }
          if (!swapped) {
            restore()
            throw new java.io.IOException(s"rename $tmp -> $dst failed")
          }
          if (hadPrior) fs.delete(bak, false)
      }
    } catch {
      case NonFatal(ex) => // never leave a half-written temp behind
        try fs.delete(tmp, false) catch { case NonFatal(_) => }
        throw ex
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
