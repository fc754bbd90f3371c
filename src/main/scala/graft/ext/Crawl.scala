package graft.ext
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end crawl-to-corpus composite — the stages every crawl-fed
  * training-data pipeline chains, here in REAL pipeline order over one
  * deterministic fixture so an oracle can replay the whole chain as a
  * single CTE stack (the c40 contract: each stage is individually
  * oracle-gated elsewhere — c38/c39 URLs, t38 extraction, t26 scrub,
  * t01 langid, t02 quality — and this query proves they COMPOSE:
  * column contracts, stage ordering, verdict accounting):
  *
  *  1. URL canonicalization ([[Curation.urlNormalize]] over the
  *     doc_id % 7 [[Curation.urlPlant]]);
  *  2. canonical-URL frontier dedup — keeper = lowest doc_id per
  *     norm_url (the c39 keeper rule), BEFORE fetch: a crawler never
  *     pays to fetch a URL it has already seen;
  *  2.5. robots admission ([[Curation.admissionVerdict]], the c43
  *     verdict over the per-domain robots plant) — ALSO before fetch:
  *     RFC 9309 compliance means disallowed paths are never fetched;
  *  3. fetch + extract — [[TextAnalysis.htmlWrap]] (the deterministic
  *     page plant) then [[TextAnalysis.htmlExtract]], admitted keepers
  *     only;
  *  4. cross-doc boilerplate scrub on the EXTRACTED text
  *     ([[TextAnalysis.boilerplateScrub]] retargeted): the wrap's
  *     "related reading" paragraph survives extraction by design (low
  *     link density) and is exactly what the cross-doc stage must
  *     catch;
  *  5. quality (t02 formula) + language ID (t01 predictor) on the
  *     SCRUBBED text; keep verdict = extracted at least one block AND
  *     non-empty after scrub AND quality >= `minQuality`;
  *  6. per-source corpus datasheet: stage-by-stage loss accounting
  *     (crawled, URL-dup, robots-blocked, fetched, boilerplate tokens,
  *     then the per-CAUSE fetched-doc drops: no extracted block /
  *     scrubbed-to-empty / low-quality / kept) plus kept-corpus size
  *     and language mix.
  *
  * Scale shape, stage by stage: (1) narrow projection; (2) one
  * doc-PARTITIONED window on norm_url (one shuffle, no global order);
  * (2.5) one broadcast rules-array attach + a narrow array fold;
  * (3) narrow projection; (4) shingle explode -> lexicon groupBy ->
  * equi-joins on (doc_id, pos) — t26's shape unchanged; (5) narrow
  * ([[graft.functions.QualityCountsOf]], no word arrays); (6) two
  * partial-aggregable groupBy(source) rollups joined on source (20
  * sources — broadcastable at any corpus scale). No cartesian, no
  * unpartitioned window, no driver-side data.
  */
object Crawl {

  /** Stages 1-2: canonical URL + frontier-dedup verdict for EVERY
    * crawled doc. Output = input columns + (url, scheme, host, port,
    * path, query_norm, norm_url, domain) + keep_doc (the group's
    * keeper) + is_url_dup.
    */
  def urlStage(docs: DataFrame): DataFrame = {
    val normed = Curation.urlNormalize(
      Curation.urlPlant(graft.core.Tables.spread(docs)))
    normed
      .withColumn("keep_doc",
        min(col("doc_id")).over(Window.partitionBy(col("norm_url"))))
      .withColumn("is_url_dup", col("doc_id") =!= col("keep_doc"))
  }

  /** Stage 2.5: robots admission on the staged frontier
    * ([[Curation.admissionVerdict]] — RFC 9309 §2.2.2 longest-match
    * Allow/Disallow against the per-domain robots plant): a compliant
    * crawler never fetches a disallowed path, so blocked URLs leave
    * the chain HERE, before fetch, alongside the URL dups. Adds
    * (target, matched_rule, matched_allow, allowed) to every staged
    * row; URL dups keep their own verdict so the datasheet's drop
    * classes stay disjoint (a dup was never going to be fetched,
    * whatever robots says).
    */
  def admissionStage(urlStaged: DataFrame): DataFrame =
    Curation.admissionVerdict(urlStaged)

  /** Stage 3: fetch (the deterministic page wrap) + extract — keepers
    * that robots ADMITS only. Output: (doc_id, source, n_kept_blocks,
    * extracted) — the t38 contract minus the per-block diagnostics the
    * downstream stages don't key on.
    */
  def extractStage(admitted: DataFrame, minWords: Int = 3,
                   maxLinkDensityPct: Int = 30): DataFrame =
    TextAnalysis.htmlExtract(
        TextAnalysis.htmlWrap(
          admitted.filter(!col("is_url_dup") && col("allowed"))),
        minWords, maxLinkDensityPct)
      .select(col("doc_id"), col("source"),
        col("n_kept").as("n_kept_blocks"), col("extracted"))

  /** Stage 4: cross-doc boilerplate scrub ON the extracted text —
    * [[TextAnalysis.boilerplateScrub]] with `extracted` standing in
    * for `text` (the column-contract handoff the composite exists to
    * prove). Output: stage-3 columns + (n_tokens, n_scrub_kept,
    * scrubbed_text).
    */
  def scrubStage(extracted: DataFrame, shingle: Int = 3,
                 minDocs: Long = 20L): DataFrame = {
    val scrubbed = TextAnalysis.boilerplateScrub(
        extracted.select(col("doc_id"), col("extracted").as("text")),
        shingle, minDocs)
      .withColumnRenamed("n_kept", "n_scrub_kept")
    extracted.join(scrubbed, Seq("doc_id"))
  }

  /** Stage 5: t02 quality + t01 language ID on the scrubbed text, and
    * the keep verdict. quality is NULL (not a crash, not a garbage
    * 0.8 from the empty-token artifact of split('')) when the scrub
    * left nothing. Output: stage-4 columns + (n_words, quality,
    * predicted_lang, kept).
    */
  def scoreStage(scrubbed: DataFrame,
                 minQuality: Double = 0.65): DataFrame = {
    val allStop = TextAnalysis.stopwords.flatMap(_._2)
    scrubbed
      .withColumn("__q",
        graft.functions.QualityCountsOf(col("scrubbed_text"), allStop))
      .withColumn("n_words", col("__q.n_words"))
      .withColumn("quality",
        when(length(col("scrubbed_text")) > 0,
          TextAnalysis.qualityScoreOf(col("n_words"),
            col("__q.n_distinct"), col("__q.n_stop"), col("__q.len"))))
      .withColumn("predicted_lang",
        TextAnalysis.langIdOf(TextOps.words(col("scrubbed_text"))))
      .withColumn("kept",
        col("n_kept_blocks") >= 1 && length(col("scrubbed_text")) > 0 &&
          col("quality") >= minQuality)
      .drop("__q")
  }

  /** The full chain + stage 6: one datasheet row per source, ordered
    * by source — crawl-loss accounting a corpus release documents
    * (cf. Gebru et al. 2021 "Datasheets for Datasets" §3.2
    * collection/cleaning provenance).
    */
  def corpusDatasheet(docs: DataFrame, minQuality: Double = 0.65,
                      shingle: Int = 3, minDocs: Long = 20L): DataFrame = {
    // stage boundaries materialize once: `staged` feeds both the crawl
    // rollup and extraction, and the scrub stage reads its input three
    // times (shingle lexicon, token table, length rollup) — without
    // the guards the regex-heavy extraction re-runs per consumer
    val staged = admissionStage(urlStage(docs)).cpGuard()
    val scored = scoreStage(
      scrubStage(extractStage(staged).cpGuard(), shingle, minDocs),
      minQuality)
    val crawled = staged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_url_dup"), 1L).otherwise(0L)).as("n_url_dup"),
        sum(when(!col("is_url_dup") && !col("allowed"), 1L).otherwise(0L))
          .as("n_robots_blocked"))
    val langCols = TextAnalysis.stopwords.map { case (l, _) =>
      sum(when(col("kept") && col("predicted_lang") === l, 1L)
        .otherwise(0L)).as(s"n_$l")
    }
    // per-CAUSE drop counters partition the fetched set: no extracted
    // block / scrubbed to nothing / genuinely low-quality / kept — a
    // datasheet that lumped the first three under "low quality" would
    // overstate the quality-failure count
    val corpusAggs = Seq(
        sum(col("n_tokens") - col("n_scrub_kept")).as("boiler_tokens"),
        sum(when(col("n_kept_blocks") === 0, 1L).otherwise(0L))
          .as("n_no_blocks"),
        sum(when(col("n_kept_blocks") >= 1 &&
          length(col("scrubbed_text")) === 0, 1L).otherwise(0L))
          .as("n_scrub_empty"),
        sum(when(col("n_kept_blocks") >= 1 &&
          length(col("scrubbed_text")) > 0 &&
          col("quality") < minQuality, 1L).otherwise(0L))
          .as("n_low_quality"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), length(col("scrubbed_text")).cast("long")))
          .as("kept_chars"),
        sum(when(col("kept"), col("n_scrub_kept"))).as("kept_words"),
        countDistinct(when(col("kept"), col("predicted_lang")))
          .as("n_langs_kept")) ++ langCols ++ Seq(
        min(when(col("kept"), col("quality"))).as("min_quality"),
        max(when(col("kept"), col("quality"))).as("max_quality"))
    val corpus = scored.groupBy(col("source"))
      .agg(corpusAggs.head, corpusAggs.tail: _*)
    // a source whose every doc lost the URL race has no corpus row —
    // the LEFT join keeps its loss accounting visible, zeros attached
    crawled.join(corpus, Seq("source"), "left")
      .select(Seq(col("source"), col("n_docs"), col("n_url_dup"),
        col("n_robots_blocked"),
        (col("n_docs") - col("n_url_dup") - col("n_robots_blocked"))
          .as("n_fetched"),
        coalesce(col("boiler_tokens"), lit(0L)).as("boiler_tokens"),
        coalesce(col("n_no_blocks"), lit(0L)).as("n_no_blocks"),
        coalesce(col("n_scrub_empty"), lit(0L)).as("n_scrub_empty"),
        coalesce(col("n_low_quality"), lit(0L)).as("n_low_quality"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        coalesce(col("kept_words"), lit(0L)).as("kept_words"),
        coalesce(col("n_langs_kept"), lit(0L)).as("n_langs_kept")) ++
        TextAnalysis.stopwords.map { case (l, _) =>
          coalesce(col(s"n_$l"), lit(0L)).as(s"n_$l") } ++
        Seq(col("min_quality"), col("max_quality")): _*)
      .orderBy(col("source"))
  }
}
