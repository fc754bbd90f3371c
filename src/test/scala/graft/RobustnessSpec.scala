package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.extract.Extractors
import graft.model.Cricsheet

/** Malformed/degenerate input behavior: the reference's .get() chains
  * tolerate absent fields but crash on absent top-level keys
  * (deliverywise raises KeyError); the engine's contract is null rows,
  * never job failure.
  */
class RobustnessSpec extends SparkSpec {

  private def withFiles(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("graft_rb").toString
    files.foreach { case (name, content) =>
      Files.writeString(Paths.get(dir, name), content)
    }
    // plus one good fixture for contrast
    Files.copy(Paths.get(fixturesDir, "1001.json"), Paths.get(dir, "1001.json"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("syntactically broken JSON yields a null row, not a crash") {
    val dir = withFiles("9001.json" -> "{ this is not json")
    val raw = Cricsheet.read(spark, dir)
    assert(raw.count() == 2)
    val mw = Extractors.matchwise(raw)
    // the broken file still carries its match_id (from the name); all
    // extracted fields are null
    val broken = mw.filter(col("match_id") === 9001).collect().head
    assert(broken.isNullAt(broken.fieldIndex("date")))
    assert(broken.isNullAt(broken.fieldIndex("team_1")))
    // the good file is unaffected
    assert(mw.filter(col("match_id") === 1001).count() == 1)
  }

  test("valid JSON missing top-level innings extracts matchwise with 0 totals") {
    val dir = withFiles("9002.json" ->
      """{"info":{"dates":["2022-02-02"],"venue":"V","teams":["A","B"],
        |"toss":{"winner":"A","decision":"bat"},
        |"outcome":{"result":"no result"}}}""".stripMargin)
    val mw = Extractors.matchwise(Cricsheet.read(spark, dir))
    val r = mw.filter(col("match_id") === 9002).collect().head
    assert(r.getAs[String]("team_1") == "A")
    // NOTE: getAs[Int] would unbox null to 0 — check nullability first
    assert(!r.isNullAt(r.fieldIndex("team_1_total_runs")))
    assert(r.getAs[Int]("team_1_total_runs") == 0)
    assert(!r.isNullAt(r.fieldIndex("team_2_total_runs")))
    assert(r.getAs[Int]("team_2_total_runs") == 0)
    // deliverywise simply has no rows for it (reference raises KeyError)
    val dw = Extractors.deliverywise(Cricsheet.read(spark, dir))
    assert(dw.filter(col("match_id") === 9002).count() == 0)
    assert(dw.filter(col("match_id") === 1001).count() == 8)
  }

  test("empty zip archive yields zero matches, not a crash") {
    import java.io.{File, FileOutputStream}
    import java.util.zip.ZipOutputStream
    val dir = Files.createTempDirectory("graft_rb_zip")
    val zip = new File(dir.toFile, "empty.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip))
    zos.close() // no entries at all
    assert(graft.sources.ZipSource.readMatches(spark, zip.getAbsolutePath).count() == 0)
  }

  test("zip with only non-json entries yields zero matches") {
    import java.io.{File, FileOutputStream}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_rb_zip2")
    val zip = new File(dir.toFile, "noise.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip))
    zos.putNextEntry(new ZipEntry("README.txt")); zos.write("hi".getBytes); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("sub/")); zos.closeEntry() // bare directory
    zos.close()
    assert(graft.sources.ZipSource.readMatches(spark, zip.getAbsolutePath).count() == 0)
  }

  test("zip entry with broken JSON parses to a null-fields row, not a crash") {
    import java.io.{File, FileOutputStream}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_rb_zip3")
    val zip = new File(dir.toFile, "bad.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zip))
    zos.putNextEntry(new ZipEntry("t/9001.json"))
    zos.write("{ not json".getBytes); zos.closeEntry()
    zos.close()
    val m = graft.sources.ZipSource.readMatches(spark, zip.getAbsolutePath)
    assert(m.count() == 1)
    assert(m.filter(col("info").isNull).count() == 1) // parsed struct is null
    assert(m.collect()(0).getAs[Int]("match_id") == 9001) // id still from entry name
  }

  test("corrupt zip bytes salvage decoded entries instead of failing the job") {
    import java.io.{ByteArrayOutputStream, File}
    import java.nio.file.{Files => JFiles}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = Files.createTempDirectory("graft_rb_zip4")
    // one good entry, then truncate the stream mid-archive
    val buf = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(buf)
    zos.putNextEntry(new ZipEntry("t/1001.json"))
    zos.write(Files.readAllBytes(Paths.get(fixturesDir, "1001.json")))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("t/1002.json"))
    zos.write(Files.readAllBytes(Paths.get(fixturesDir, "1002.json")))
    zos.closeEntry(); zos.close()
    val whole = buf.toByteArray
    val truncated = java.util.Arrays.copyOf(whole, whole.length - whole.length / 3)
    val zip = new File(dir.toFile, "trunc.zip")
    JFiles.write(zip.toPath, truncated)
    // garbage that is not a zip at all
    val junk = new File(dir.toFile, "junk.zip")
    JFiles.write(junk.toPath, Array.fill[Byte](512)(0x41))

    val m = graft.sources.ZipSource.readMatches(spark, dir.toString + "/*.zip")
    val n = m.count() // must not throw; first archive salvages >= 1 entry
    assert(n >= 1, s"expected salvaged entries, got $n")
    assert(m.filter(col("match_id") === 1001).count() == 1)
  }

  test("hostile archive raising a runtime exception still salvages") {
    import java.io.{ByteArrayOutputStream, File}
    import java.nio.file.{Files => JFiles}
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // valid zip, then corrupt the SECOND entry's name into invalid
    // UTF-8 — ZipInputStream.getNextEntry throws IllegalArgumentException
    // (MALFORMED), not IOException, from the name decoder
    val buf = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(buf)
    zos.putNextEntry(new ZipEntry("t/1001.json"))
    zos.write(Files.readAllBytes(Paths.get(fixturesDir, "1001.json")))
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("NAMEZZZZ.json"))
    zos.write("{}".getBytes); zos.closeEntry()
    zos.close()
    val bytes = buf.toByteArray
    val marker = "NAMEZZZZ".getBytes("UTF-8")
    val bad = Array[Byte](0xC3.toByte, 0x28, 0xC3.toByte, 0x28,
      0xC3.toByte, 0x28, 0xC3.toByte, 0x28) // invalid UTF-8 sequences
    var i = 0
    while (i <= bytes.length - marker.length) {
      if (bytes.slice(i, i + marker.length).sameElements(marker))
        System.arraycopy(bad, 0, bytes, i, bad.length)
      i += 1
    }
    val dir = Files.createTempDirectory("graft_rb_zip5")
    val zip = new File(dir.toFile, "hostile.zip")
    JFiles.write(zip.toPath, bytes)

    val df = graft.sources.ZipSource.expandEntriesWithErrors(
      spark.read.format("binaryFile").load(zip.getAbsolutePath))
    val rows = df.collect()
    // first entry salvaged; one error marker row for the hostile name
    assert(rows.count(_.getAs[String]("zip_error") == null) == 1)
    val err = rows.filter(_.getAs[String]("zip_error") != null)
    assert(err.length == 1, s"expected an error marker, got ${rows.toSeq}")
    // the lenient batch path drops the marker and keeps the salvage
    val m = graft.sources.ZipSource.readMatches(spark, zip.getAbsolutePath)
    assert(m.filter(col("match_id") === 1001).count() == 1)
  }

  test("file without numeric name gets null match_id, still processed") {
    val dir = withFiles("notes.json" ->
      """{"info":{"dates":["2022-03-03"],"venue":"V","teams":["A","B"],
        |"toss":{"winner":"A","decision":"bat"},
        |"outcome":{"result":"tie"}}}""".stripMargin)
    val raw = Cricsheet.read(spark, dir)
    assert(raw.filter(col("match_id").isNull).count() == 1)
  }

  test("htmlExtract degrades predictably on malformed markup, never throws") {
    import spark.implicits._
    val cases = Seq(
      // unclosed <p>: no sentinel fires, both paragraphs flow into one block
      1L -> ("<html><body><p>alpha beta gamma delta<p>unclosed second " +
        "para epsilon zeta</body></html>"),
      // nested divs: a sentinel per </div>, inner splits before outer tail
      2L -> ("<div>outer start words here <div>inner nested words delta" +
        "</div> outer tail words omega</div>"),
      // attribute containing '>': the anchor regex cuts at the first '>',
      // the attr tail bleeds into anchor text — the density rule still
      // runs on exact integers and (deterministically) drops the block
      3L -> "<p>before <a href=\"x>y\">anchor text</a> after words here</p>",
      // CDATA-ish noise: '<![CDATA[..]]>' matches the generic tag strip
      4L -> ("<p>keep these words</p><![CDATA[ raw cdata noise ]]>" +
        "<p>more words kept</p>"),
      // bare '<'..'>' in prose parses as a tag and is stripped — the
      // documented degradation of regex extraction on math-y text
      8L -> "<p>a < b and c > d math words here</p>",
      // unclosed trailing <script>: the span rule needs a closer; the
      // tail degrades to visible text instead of vanishing silently
      9L -> ("<script>var x = 1;</script><p>after script words</p>" +
        "<script>unclosed script trailing"))
    val df = cases.toDF("doc_id", "html").withColumn("source", lit("s"))
    val got = graft.ext.TextAnalysis.htmlExtract(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5),
          r.getString(6)))).toMap
    assert(got(1L) == ((1, 1, 56L, 0L,
      "alpha beta gamma delta unclosed second para epsilon zeta")))
    assert(got(2L) == ((2, 2, 69L, 0L,
      "outer start words here inner nested words delta outer tail words omega")))
    // ac*100 = 1400 > tc*30 = 1140: integer-exact density drop
    assert(got(3L) == ((1, 0, 38L, 14L, "")))
    assert(got(4L) == ((2, 2, 31L, 0L, "keep these words more words kept")))
    assert(got(8L) == ((1, 1, 19L, 0L, "a d math words here")))
    assert(got(9L) == ((2, 2, 42L, 0L,
      "after script words unclosed script trailing")))
  }
}
