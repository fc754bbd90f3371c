package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A Hadoop FileSystem registered under the NON-file scheme
  * `graftfs://` — the in-process stand-in for s3a:// (no HDFS
  * minicluster ships with hadoop-client-api): it delegates storage to
  * the local disk but every path keeps the foreign scheme, so any
  * java.io.File shortcut or hardcoded `file:` assumption in the engine
  * fails loudly instead of silently passing on LocalFS. Extends
  * RawLocalFileSystem (not LocalFileSystem) so the checksum layer's
  * file:-pinned checkPath does not reject the scheme.
  */
class GraftFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
