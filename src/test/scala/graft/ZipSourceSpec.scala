package graft

import java.io.{FileOutputStream, File}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.ext.Multimodal
import graft.extract.Extractors
import graft.model.Cricsheet
import graft.sources.ZipSource

class ZipSourceSpec extends SparkSpec {

  private lazy val zipPath: String = {
    val dir = Files.createTempDirectory("graft_zip")
    val zip = new File(dir.toFile, "t20s.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip))
    // mirror the real archive layout: entries in a subdirectory
    Files.list(Paths.get(fixturesDir)).iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".json")) {
        zos.putNextEntry(new ZipEntry(s"t20s_male/${p.getFileName}"))
        zos.write(Files.readAllBytes(p))
        zos.closeEntry()
      }
    }
    zos.putNextEntry(new ZipEntry("t20s_male/README.txt"))
    zos.write("not a match".getBytes)
    zos.closeEntry()
    zos.close()
    zip.getAbsolutePath
  }

  test("zip entries expand distributed, filtered to .json") {
    val entries = ZipSource.readEntries(spark, zipPath)
    assert(entries.count() == 6) // README.txt excluded
    assert(entries.filter(col("entry").contains("README")).count() == 0)
  }

  test("matches parsed from the archive equal the directory-based read") {
    val fromZip = Extractors.matchwise(ZipSource.readMatches(spark, zipPath))
    val fromDir = Extractors.matchwise(Cricsheet.read(spark, fixturesDir))
    assert(fromZip.exceptAll(fromDir).count() == 0)
    assert(fromDir.exceptAll(fromZip).count() == 0)
    assert(fromZip.count() == 6)
  }

  test("archive fetch lands a file:// URL and the zip reads end-to-end") {
    val landing = Files.createTempDirectory("graft_fetch").toString
    val url = new File(zipPath).toURI.toString // file:///.../t20s.zip
    assert(graft.sources.Fetch.isFetchUrl(url))
    assert(!graft.sources.Fetch.isFetchUrl("/data/landing/t20s.zip"))
    val landed = graft.sources.Fetch.toLanding(spark, url, landing)
    assert(landed.endsWith("t20s.zip"))
    assert(ZipSource.readMatches(spark, landed).count() == 6)
    // re-fetch overwrites, not duplicates or fails
    val again = graft.sources.Fetch.toLanding(spark, url, landing)
    assert(again == landed)
  }

  test("batched decode plumbing runs the injected codec per payload") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val withBin = Multimodal.withPayload(docs.limit(50))
    val decoded = Multimodal.decodeBatched(withBin) { bytes =>
      (bytes.length % 1920, bytes.length % 1080) // deterministic stub codec
    }
    assert(decoded.count() == 50)
    val bad = decoded.filter(
      col("width") =!= col("media_meta.n_bytes") % 1920 ||
      col("height") =!= col("media_meta.n_bytes") % 1080)
    assert(bad.count() == 0)
  }
}
