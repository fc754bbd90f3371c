package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.Crawl

/** The c40 composite's stage contracts: each stage's output schema is
  * the next stage's input contract (the handoffs the isolated
  * per-operator oracles can't see), plus the verdict arithmetic and
  * the honest residue behaviors (the surviving doc-id token, the
  * short-doc path).
  */
class CrawlSpec extends SparkSpec {

  // distinct main texts so no cross-doc junction shingle is boilerplate
  private def fixture = {
    import spark.implicits._
    (0 until 21).map { i =>
      val text = i match {
        case 2 => "spam " * 19 + "spam" // low quality: 20x one word
        case 9 => "tiny doc" // < minWords: main block falls to the word floor
        case _ => s"alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i"
      }
      (i.toLong, s"src${i % 2}", text)
    }.toDF("doc_id", "source", "text")
  }

  test("stage-boundary schemas: each output is the next stage's input") {
    val staged = Crawl.urlStage(fixture)
    // stage 1-2 adds the URL columns + the keeper verdict, keeps input
    for (c <- Seq("doc_id", "source", "text", "url", "norm_url", "domain",
        "keep_doc", "is_url_dup"))
      assert(staged.columns.contains(c), s"urlStage missing $c")
    val admitted = Crawl.admissionStage(staged)
    // stage 2.5 adds the robots verdict, keeps every staged column
    for (c <- staged.columns ++ Seq("target", "matched_rule",
        "matched_allow", "allowed"))
      assert(admitted.columns.contains(c), s"admissionStage missing $c")
    val ex = Crawl.extractStage(admitted)
    assert(ex.columns.toSeq ==
      Seq("doc_id", "source", "n_kept_blocks", "extracted"))
    val sc = Crawl.scrubStage(ex, minDocs = 2L)
    assert(sc.columns.toSeq == Seq("doc_id", "source", "n_kept_blocks",
      "extracted", "n_tokens", "n_scrub_kept", "scrubbed_text"))
    val scored = Crawl.scoreStage(sc)
    for (c <- Seq("n_words", "quality", "predicted_lang", "kept"))
      assert(scored.columns.contains(c), s"scoreStage missing $c")
    val ds = Crawl.corpusDatasheet(fixture, minDocs = 2L)
    assert(ds.columns.toSeq == Seq("source", "n_docs", "n_url_dup",
      "n_robots_blocked", "n_fetched", "boiler_tokens", "n_no_blocks",
      "n_scrub_empty", "n_low_quality", "n_kept", "kept_chars",
      "kept_words", "n_langs_kept", "n_en", "n_es", "n_fr", "n_de", "n_zh",
      "min_quality", "max_quality"))
    val types = ds.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("source") == StringType)
    for (c <- Seq("n_docs", "n_url_dup", "n_robots_blocked", "n_fetched",
        "boiler_tokens", "n_no_blocks", "n_scrub_empty", "n_low_quality",
        "n_kept", "kept_chars", "kept_words", "n_langs_kept", "n_en",
        "n_zh"))
      assert(types(c) == LongType, s"$c should be LongType, was ${types(c)}")
    assert(types("min_quality") == DoubleType)
  }

  test("URL frontier dedup: the %7 in {1,3,5} classes collapse to one keeper") {
    val staged = Crawl.urlStage(fixture)
    // ids 0..20: residues 1/3/5 have 3 members each; 1 and 5 share a
    // literal URL, 3 collapses because gclid is ALL of its query
    val dups = staged.filter(col("is_url_dup"))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(dups.toSeq == Seq(8L, 10L, 12L, 15L, 17L, 19L), s"got ${dups.toSeq}")
    // keeper of each collapsed group is its lowest doc_id
    val keep = staged.filter(col("doc_id") === 8L)
      .select(col("keep_doc")).head().getLong(0)
    assert(keep == 1L)
  }

  test("scrub removes the wrap's related-reading paragraph, id token survives") {
    val sc = Crawl.scrubStage(
      Crawl.extractStage(Crawl.admissionStage(Crawl.urlStage(fixture))),
      minDocs = 2L)
    val row = sc.filter(col("doc_id") === 0L).head()
    val scrubbed = row.getAs[String]("scrubbed_text")
    // the 10 shared paragraph words scrub; the per-doc id token is NOT
    // cross-doc boilerplate and survives — the documented residue
    assert(scrubbed ==
      "alpha0 bravo0 charlie0 delta0 echo0 foxtrot0 golf0 0", scrubbed)
    assert(row.getAs[Long]("n_tokens") - row.getAs[Long]("n_scrub_kept") == 10L)
  }

  test("short doc: main block falls to the word floor, residue is kept") {
    val scored = Crawl.scoreStage(Crawl.scrubStage(
      Crawl.extractStage(Crawl.admissionStage(Crawl.urlStage(fixture))),
      minDocs = 2L))
    val r = scored.filter(col("doc_id") === 9L).head()
    // only the related-reading block survived extraction…
    assert(r.getAs[Int]("n_kept_blocks") == 1)
    // …and after the scrub only the id token remains; single distinct
    // non-stopword token scores 0.4+0.4+0.2*min(len/10,1) — above any
    // sane threshold, the residue blind spot pinned honestly
    assert(r.getAs[String]("scrubbed_text") == "9")
    assert(r.getAs[Boolean]("kept"))
  }

  test("quality verdict: degenerate doc drops, distinct-vocab doc keeps") {
    val scored = Crawl.scoreStage(Crawl.scrubStage(
      Crawl.extractStage(Crawl.admissionStage(Crawl.urlStage(fixture))),
      minDocs = 2L))
    val spam = scored.filter(col("doc_id") === 2L).head()
    assert(spam.getAs[Double]("quality") < 0.65 && !spam.getAs[Boolean]("kept"),
      s"spam quality ${spam.getAs[Double]("quality")}")
    val good = scored.filter(col("doc_id") === 0L).head()
    assert(good.getAs[Double]("quality") >= 0.65 && good.getAs[Boolean]("kept"))
  }

  test("datasheet: per-source loss accounting is conservative") {
    val ds = Crawl.corpusDatasheet(fixture, minDocs = 2L).collect()
    assert(ds.length == 2)
    ds.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("n_url_dup") + r.getAs[Long]("n_robots_blocked") +
          r.getAs[Long]("n_fetched"),
        "dup/blocked/fetched must partition the crawl")
      assert(r.getAs[Long]("n_fetched") ==
        r.getAs[Long]("n_no_blocks") + r.getAs[Long]("n_scrub_empty") +
          r.getAs[Long]("n_low_quality") + r.getAs[Long]("n_kept"),
        "the per-cause drop classes must partition the fetched set")
      // the wrap plant always leaves a survivable related-reading block
      // and a unique id token, so the first two causes are honest zeros
      assert(r.getAs[Long]("n_no_blocks") == 0L &&
        r.getAs[Long]("n_scrub_empty") == 0L)
      assert(r.getAs[Long]("n_kept") == Seq("n_en", "n_es", "n_fr", "n_de",
        "n_zh").map(r.getAs[Long]).sum, "lang mix must partition the kept set")
      assert(r.getAs[Long]("boiler_tokens") == 10L * r.getAs[Long]("n_fetched"),
        "every fetched doc sheds exactly the 10-word wrap paragraph")
    }
    val all = ds.map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_url_dup"),
      r.getAs[Long]("n_robots_blocked"), r.getAs[Long]("n_fetched")))
    assert(all.map(_._1).sum == 21L && all.map(_._2).sum == 6L)
    // robots blocks the non-dup members of %7 classes {1, 4, 6}:
    // ids 1,4,6,11,13,18,20 (8/15/19 already fell to the URL race)
    assert(all.map(_._3).sum == 7L, s"robots_blocked ${all.map(_._3).sum}")
    // fetched keepers: class 0 (3 distinct), class 2 (3 distinct),
    // one keeper each for the collapsed classes 3 and 5
    assert(all.map(_._4).sum == 8L)
  }
}
