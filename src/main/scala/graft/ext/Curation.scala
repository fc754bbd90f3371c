package graft.ext
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Training-data curation operators: the selection/layout steps between
  * dedup/quality scoring and an actual training corpus.
  *
  * Both operators are deterministic by construction (hash order / key
  * order, never rand()), so runs are reproducible and the DuckDB oracle
  * can verify them value-for-value — the property a curation pipeline
  * needs for auditable dataset releases.
  */
object Curation {

  /** Portable 32-bit document hash (first 8 hex chars of md5) — numeric,
    * identical in Spark and DuckDB, used as the seedless shuffle key.
    */
  private def hash32 = expr(
    "CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)")

  /** Deterministic stratified sample: the `perStratum` docs per stratum
    * that rank first in (hash32(text), doc_id) order — a uniform-ish,
    * seedless shuffle every engine reproduces bit-for-bit.
    *
    * Default path is the 100 TB shape: the typed TopKAggregator keeps
    * only perStratum candidates per stratum on the MAP side, so the
    * exchange carries O(strata x N) rows no matter how skewed the
    * strata are (a 5-language corpus would otherwise funnel through 5
    * window tasks). `scalable = false` is the window twin used to
    * cross-check the aggregator path in the spec.
    */
  def stratifiedSample(docs: DataFrame, stratum: String, perStratum: Int,
                       scalable: Boolean = true): DataFrame = {
    val spread = graft.core.Tables.spread(docs)
    if (scalable) {
      val topk = graft.functions.TopKAggregator.topK(perStratum)
      spread
        // score = -hash: the aggregator keeps highest-score (ties by
        // lowest id), which is exactly (hash ASC, doc_id ASC)
        .withColumn("__score", negate(hash32.cast("double")))
        .groupBy(col(stratum))
        .agg(topk(col("doc_id"), col("__score")).as("sel"))
        .select(col(stratum), posexplode(col("sel")).as(Seq("idx", "s")))
        .select(col("s.id").as("doc_id"), col(stratum),
          (col("idx") + 1).cast("int").as("rk"))
        .orderBy(col(stratum), col("rk"))
    } else {
      val w = Window.partitionBy(col(stratum)).orderBy(hash32, col("doc_id"))
      spread
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= perStratum)
        .select(col("doc_id"), col(stratum), col("rk"))
        .orderBy(col(stratum), col("rk"))
    }
  }

  /** Weighted mixture sampling: per-stratum quotas (the dataset-mixing
    * step — "40% en, 20% de, ..." — of a training-corpus recipe), each
    * stratum's quota taken in the same deterministic hash order as
    * [[stratifiedSample]]. One map-side top-(max quota) aggregation
    * bounds the exchange; the exact per-stratum cut is a broadcast-join
    * filter, so uneven quotas cost nothing extra. Strata without a
    * quota are dropped BEFORE the aggregation — the quota keys are a
    * small literal set, so the cut is an `isin` predicate that pushes
    * down to the scan instead of top-k-aggregating strata whose rows
    * would all be discarded at the join.
    */
  def mixtureSample(docs: DataFrame, stratum: String,
                    quotas: Map[String, Int]): DataFrame = {
    require(quotas.nonEmpty && quotas.values.forall(_ >= 0),
      "quotas must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val maxQ = quotas.values.max
    val quotaDf = quotas.toSeq.toDF(stratum, "__quota")
    val inQuota = docs.filter(col(stratum).isin(quotas.keys.toSeq: _*))
    stratifiedSample(inQuota, stratum, maxQ, scalable = true)
      .join(broadcast(quotaDf), stratum)
      .filter(col("rk") <= col("__quota"))
      .select(col("doc_id"), col(stratum), col("rk"))
      .orderBy(col(stratum), col("rk"))
  }

  /** Token-budget mixture planning — the recipe arithmetic of a
    * training mix ("source X gets w% of a B-token budget; how many
    * EPOCHS of X is that?" — the repeat-factor table a data card
    * publishes). Per stratum: doc count and the exact whitespace-token
    * sum (same token rule as t03); quota_tokens = budget * w DIV 100
    * in exact integer math; epochs = quota / available as ONE IEEE
    * division, so the doubles verify cross-engine. Strata without a
    * weight drop before the aggregation (isin pushes to the scan).
    * Scale shape: one partial-aggregable groupBy — the exchange
    * carries a row per (partition, stratum); the plan artifact costs
    * what a COUNT(*) costs at any corpus size.
    *
    * Output: (stratum, n_docs, n_tokens, weight_pct, quota_tokens,
    * epochs); epochs > 1 means that stratum must repeat to fill its
    * share of the budget.
    */
  def tokenBudgetPlan(docs: DataFrame, stratum: String, budgetTokens: Long,
                      weights: Map[String, Int]): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0) &&
      weights.values.sum == 100,
      "weights must be positive percents summing to 100")
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF(stratum, "weight_pct")
    graft.core.Tables.spread(docs)
      .filter(col(stratum).isin(weights.keys.toSeq: _*))
      .groupBy(col(stratum))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.words(col("text"))).cast("long")).as("n_tokens"))
      .join(broadcast(wDf), stratum)
      .withColumn("quota_tokens",
        expr(s"CAST(($budgetTokens * weight_pct) DIV 100 AS BIGINT)"))
      .withColumn("epochs",
        col("quota_tokens").cast("double") / col("n_tokens").cast("double"))
      .select(col(stratum), col("n_docs"), col("n_tokens"),
        col("weight_pct"), col("quota_tokens"), col("epochs"))
      .orderBy(col(stratum))
  }

  /** Temperature-scaled multilingual mixture (the T5/mT5 alpha-sampling
    * rule at alpha = 1/2): each stratum's sampling weight is
    * sqrt(n_docs), damping the head languages so the tail is not
    * drowned. Portability of the irrational weights: sqrt is
    * correctly-rounded IEEE in both engines and the 2^20 fixed-point
    * scaling multiply is exact (power of two), so per-stratum
    * weight_fp is bit-identical; the weight TOTAL is then an integer
    * sum (order-free where an IEEE sum would not be) and quotas are
    * pure integer floor division. One partial-aggregable groupBy plus
    * a broadcast 1-row total.
    */
  def temperatureMixture(docs: DataFrame, stratum: String,
                         budgetDocs: Long): DataFrame = {
    require(budgetDocs > 0, "budget must be positive")
    val counts = graft.core.Tables.spread(docs)
      .groupBy(col(stratum))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_fp",
        floor(sqrt(col("n_docs").cast("double")) * lit(1048576L)).cast("long"))
    val total = counts.agg(sum(col("weight_fp")).as("tw"))
    counts.crossJoin(broadcast(total))
      .withColumn("quota_docs",
        expr(s"CAST(($budgetDocs * weight_fp) DIV tw AS BIGINT)"))
      .select(col(stratum), col("n_docs"), col("weight_fp"), col("quota_docs"))
      .orderBy(col(stratum))
  }

  /** Materialize a [[tokenBudgetPlan]]: per-doc COPY COUNTS that fill
    * each stratum's token quota exactly — floor(quota/total) full
    * epochs for every doc plus one greedy partial pass in the
    * deterministic hash order until the remainder is spent (the doc
    * whose exclusive prefix crosses the remainder is the last one in).
    * All integer arithmetic (DIV/MOD on exact token sums), so the copy
    * counts verify cross-engine.
    *
    * Scale shape: ONE range exchange for the global exclusive prefix
    * sum over (stratum, hash, doc_id) ([[PrefixSum.withRunningSum]] —
    * balanced regardless of stratum skew, never a per-stratum window
    * funnel); per-stratum starts/totals are a partial-aggregable
    * groupBy broadcast back. Output: (stratum, doc_id, n_tokens,
    * n_copies) for every doc of a weighted stratum (n_copies may be 0).
    */
  def budgetMaterialize(docs: DataFrame, stratum: String, budgetTokens: Long,
                        weights: Map[String, Int]): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    require(weights.nonEmpty && weights.values.forall(_ > 0) &&
      weights.values.sum == 100,
      "weights must be positive percents summing to 100")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = graft.core.Tables.spread(docs)
      .filter(col(stratum).isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col(stratum),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens"),
        hash32.as("__h"))
    val run = PrefixSum.withRunningSum(toks,
      Seq(col(stratum), col("__h"), col("doc_id")), "n_tokens", "__run")
    val starts = run.groupBy(col(stratum))
      .agg(min(col("__run")).as("__start"),
        sum(col("n_tokens")).as("__total"))
    // quotas in exact Scala long math — same DIV-100 rule as the plan
    val quotaDf = weights.toSeq
      .map { case (k, w) => (k, budgetTokens * w / 100) }
      .toDF(stratum, "__quota")
    run.join(broadcast(starts), stratum)
      .join(broadcast(quotaDf), stratum)
      .withColumn("n_copies", expr(
        "CAST(__quota DIV __total + IF(__run - __start < __quota % __total, 1, 0) AS BIGINT)"))
      .select(col(stratum), col("doc_id"), col("n_tokens"), col("n_copies"))
      .orderBy(col(stratum), col("doc_id"))
  }

  /** Target-affinity data selection (the DSIR family, Xie et al. 2023,
    * reduced to exact integer arithmetic): score every training doc by
    * how much its word-bigram mass appears in a TARGET corpus, and keep
    * the topN most target-like. score_int = sum over the doc's bigrams
    * (with multiplicity) of the target's exact bigram count; affinity
    * = score_int / n_bigrams — integer sums and ONE division, so the
    * ranking verifies cross-engine (the published method's log-ratio
    * weights need libm; the count-overlap form keeps the same
    * "select what resembles the target" semantics deterministically).
    * Scale shape: the target's bigram table broadcasts (a target/eval
    * set is small by definition); training docs explode to bigrams and
    * hash-join it map-side; one groupBy(doc_id) aggregation; global
    * topN = TakeOrdered. No doc-pair term anywhere.
    *
    * Output: (doc_id, score_int, n_bigrams, affinity), topN by
    * (affinity DESC, doc_id).
    */
  def targetSelect(train: DataFrame, target: DataFrame, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val tgt = graft.core.Tables.spread(target)
      .select(explode(TextOps.wordShingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("tc"))
    graft.core.Tables.spread(train)
      .select(col("doc_id"), explode(TextOps.wordShingles(col("text"), 2)).as("bigram"))
      .join(broadcast(tgt), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("tc"), lit(0L))).as("score_int"),
        count(lit(1)).as("n_bigrams"))
      .withColumn("affinity",
        col("score_int").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("affinity").desc, col("doc_id"))
      .limit(topN)
  }

  /** Deterministic train/val/test assignment: bucket = portable
    * hash32(text) mod 100, splits carved by cumulative percent weights
    * in the given order. Hash-of-content (not of id) keeps exact
    * duplicates in the SAME split — the leakage-safe convention for
    * training corpora — and re-runs reproduce the assignment
    * bit-for-bit on any engine. Pure projection: no shuffle, scan
    * speed at any corpus size.
    */
  def hashSplit(docs: DataFrame, weights: Seq[(String, Int)]): DataFrame = {
    val bucket = pmod(hash32, lit(100L))
    graft.core.Tables.spread(docs)
      .select(col("doc_id"), bucket.as("bucket"),
        splitOfBucket(bucket, weights).as("split"))
      .orderBy(col("doc_id"))
  }

  /** Cumulative-percent split label for a 0-99 bucket column. */
  private def splitOfBucket(bucket: Column,
                            weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0) &&
      weights.map(_._2).sum == 100,
      "weights must be positive percents summing to 100")
    val cuts = weights.scanLeft(0)(_ + _._2).tail.init // cumulative, last cut implied
      .zip(weights.init.map(_._1))
    cuts.foldRight(lit(weights.last._1): Column) {
      case ((cut, name), els) => when(bucket < cut, name).otherwise(els)
    }
  }

  /** LEAKAGE-SAFE split: the hashed unit is the NEAR-DUP CLUSTER
    * representative, not the document — [[hashSplit]]'s hash-of-content
    * already co-splits exact duplicates, but a near-duplicate (one
    * edited word) hashes elsewhere and lands in another split, leaking
    * training text into eval. Here minhash pairs -> connected
    * components ([[Dedup.dupClusters]]) give every doc its cluster's
    * min doc_id as rep; docs outside any pair are their own rep; the
    * split buckets h32(rep_id) — so an ENTIRE near-dup cluster travels
    * together by construction. Cost at scale: the dedup pass the
    * corpus pipeline runs anyway, plus one left join and a projection.
    *
    * Output: (doc_id, rep_id, bucket, split).
    */
  def clusterSafeSplit(docs: DataFrame, weights: Seq[(String, Int)],
                       threshold: Double): DataFrame = {
    val labels = Dedup.dupClusters(
      Dedup.minhashDup(docs, threshold).select(col("doc_a"), col("doc_b")))
    val withRep = graft.core.Tables.spread(docs).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
    val bucket = pmod(
      graft.functions.Hashing.h32(col("rep_id").cast("string")), lit(100L))
    withRep
      .select(col("doc_id"), col("rep_id"), bucket.as("bucket"),
        splitOfBucket(bucket, weights).as("split"))
      .orderBy(col("doc_id"))
  }

  /** Eval-set decontamination: training docs sharing at least one word
    * n-gram shingle with any eval doc, with the shared-shingle count —
    * the overlap check run before a corpus ships so benchmark text
    * can't leak into training data. Shape: both sides reduce to
    * distinct (doc, shingle) pairs; the train side inner-joins the
    * (small, broadcastable) eval shingle set and aggregates per doc —
    * one hash join + one hash aggregation, no pairwise doc comparison
    * anywhere, so eval-set size bounds the broadcast and corpus size
    * only the scan.
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    shingleSize: Int): DataFrame = {
    def shingles(df: DataFrame) = graft.core.Tables.spread(df)
      .select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), shingleSize)).as("s"))
    val evalShingles = shingles(eval).select(col("s")).distinct()
    shingles(train)
      .join(broadcast(evalShingles), "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-size overlapping chunks — the context-window segmentation
    * step that turns variable-length documents into training sequences
    * (word-unit windows of `chunkWords`, advancing by `stride`; the
    * last chunk may be short, and every doc emits at least one chunk).
    * All-integer window arithmetic, exact in both engines; one narrow
    * projection + explode, no shuffle — scan speed at any corpus size.
    * Output: (doc_id, chunk_idx, chunk_text, n_chunk_words).
    */
  def chunkDocs(docs: DataFrame, chunkWords: Int, stride: Int): DataFrame = {
    require(chunkWords > 0 && stride > 0, "chunkWords and stride must be positive")
    val ws = TextOps.words(col("text"))
    graft.core.Tables.spread(docs)
      .select(col("doc_id"), ws.as("ws"))
      // 1 + ceil(max(n - chunkWords, 0) / stride), integer div (`div`):
      // Column `/` is double division and rounds differently per engine
      .withColumn("nc", expr(
        s"CAST(1 + (greatest(size(ws) - $chunkWords, 0) + ${stride - 1}) div $stride AS INT)"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => slice(col("ws"), i * stride + 1, lit(chunkWords))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        array_join(col("chunk"), " ").as("chunk_text"),
        size(col("chunk")).as("n_chunk_words"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** The whole curation DAG as one query — what a corpus release run
    * actually executes: exact dedup (keep the min doc_id per identical
    * text) → quality gate → deterministic stratified sample → sequence
    * packing. Every stage is the skew-immune shape (hash-partitioned
    * dedup agg, map-side top-k sample, range-partitioned prefix sums),
    * so the composition is too. Output: one row per selected doc with
    * its sample rank and bin layout.
    */
  def corpusBuild(docs: DataFrame, perStratum: Int, qualityMin: Double,
                  capacity: Int): DataFrame = {
    val keep = docs.groupBy(md5(col("text")).as("__k"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val kept = docs.join(keep, Seq("doc_id"), "left_semi")
    val quality = TextAnalysis.qualityScore(kept)
      .select(col("doc_id"), col("quality"))
    // materialize the survivors once: the quality-scored subtree (word
    // HOFs over the whole corpus) is referenced by the sample, the
    // packing input, and the final attach — recomputing it three times
    // is the dominant cost of the composition
    val good = kept.join(quality, "doc_id")
      .filter(col("quality") >= qualityMin)
      .cpGuard()
    val sampled = good.join(
      stratifiedSample(good, "lang", perStratum).select(col("doc_id"), col("rk")),
      "doc_id")
      .cpGuard() // tiny: strata x perStratum rows
    packDocs(sampled, "lang", "n_chars", capacity, scalable = true)
      .join(sampled.select(col("doc_id"), col("quality"), col("rk")), "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality"),
        col("rk"), col("offset_in_stratum"), col("bin_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Contiguous greedy packing: docs are laid out per stratum in
    * doc_id order and cut into fixed-capacity bins by the running
    * length BEFORE each doc — the deterministic sequence-packing
    * shape used to batch variable-length documents for training
    * (capacity = context window in the length unit, here chars).
    * All-integer arithmetic, exact in both engines.
    *
    * `scalable = true` computes the running sum with the
    * [[graft.operators.PrefixSum]] range-partitioned operator (global
    * order (stratum, doc_id), per-stratum offsets recovered by
    * subtracting each stratum's starting prefix) — balanced parallelism
    * even with 5 strata. The default window path partitions by stratum:
    * identical rows, simpler plan, fine when strata are many.
    */
  def packDocs(docs: DataFrame, stratum: String, lengthCol: String,
               capacity: Int, scalable: Boolean = false): DataFrame = {
    val spread = graft.core.Tables.spread(docs)
    val withOffset =
      if (scalable) {
        val globalSum = PrefixSum.withRunningSum(spread,
          Seq(col(stratum), col("doc_id")), lengthCol, "__gsum")
        // a stratum's block is contiguous in the global order, so its
        // starting prefix is the min __gsum within the stratum
        val starts = globalSum.groupBy(col(stratum))
          .agg(min(col("__gsum")).as("__start"))
        globalSum.join(broadcast(starts), stratum)
          .withColumn("offset_in_stratum",
            (col("__gsum") - col("__start")).cast("long"))
      } else {
        val w = Window.partitionBy(col(stratum)).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        spread.withColumn("offset_in_stratum",
          coalesce(sum(col(lengthCol)).over(w), lit(0L)).cast("long"))
      }
    withOffset
      // integer div, not `/`: Spark's / is double division and double
      // truncation vs DuckDB rounding diverges at the margins
      .withColumn("bin_id", expr(s"offset_in_stratum div $capacity"))
      .select(col("doc_id"), col(stratum), col(lengthCol),
        col("offset_in_stratum"), col("bin_id"))
      .orderBy(col(stratum), col("doc_id"))
  }

  /** Priority sampling (Duffield, Lund, Thorup — JACM 2007): a
    * weighted without-replacement sample of `n` docs that supports
    * UNBIASED subset-sum estimation — the statistically principled way
    * to down-sample a corpus proportionally to a weight (here: any
    * numeric column, e.g. token counts) while keeping every later
    * "how many tokens did stratum X contribute" query answerable from
    * the sample alone. Each doc draws the seedless uniform
    * u = (hash32 + 1) / 2^32 in (0, 1] and gets priority w / u; the
    * sample is the n highest (priority, doc_id) rows; the threshold
    * tau = the (n+1)-th priority (0 when the corpus has <= n docs)
    * yields the estimator w_est = max(w, tau), whose sum is unbiased
    * for the total weight of any subset.
    *
    * Arithmetic discipline: w * 2^32 stays EXACT in a double for
    * w < 2^21 (the documents fixture is ~1e4 chars max), and the
    * priority is then ONE correctly-rounded IEEE division — both
    * engines agree bit-for-bit, no accumulation order anywhere. The
    * top-(n+1) is a TakeOrdered (map-side n+1 per partition, the
    * exchange carries O(partitions x n) rows); tau is a broadcast
    * 1-row aggregate over those n+1 rows only.
    */
  def prioritySample(docs: DataFrame, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, "n >= 1")
    val spread = graft.core.Tables.spread(docs)
    val w = col(weightCol).cast("double")
    val p = (w * lit(4294967296.0)) / (hash32.cast("double") + lit(1.0))
    val cand = spread
      .select(col("doc_id"), col(weightCol), p.as("priority"))
      .orderBy(col("priority").desc, col("doc_id")).limit(n + 1)
      .cpGuard() // read twice: tau and the sample cut
    val tau = cand.agg(
      when(count(lit(1)) === (n + 1), min(col("priority")))
        .otherwise(lit(0.0)).as("tau"))
    cand.orderBy(col("priority").desc, col("doc_id")).limit(n)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col(weightCol), col("priority"),
        greatest(w, col("tau")).as("w_est"))
      .orderBy(col("doc_id"))
  }

  /** Competence-based curriculum ordering (Platanios et al., NAACL
    * 2019): assign every doc its global training position under the
    * shortest-first difficulty order — token count ascending, tie-broken
    * by the seedless content hash then doc_id so the order is total,
    * reproducible, and content-determined. Length is the classic
    * model-free competence signal; any other integer difficulty column
    * would slot into the same order tuple.
    *
    * The global dense 1..N position comes from [[graft.operators.SeqNumber]]
    * (range-repartition + per-partition offsets) — NEVER a
    * `row_number() OVER ()` unpartitioned window, which funnels the
    * corpus through one task. At 100 TB this is the difference between
    * a curriculum build that runs and one that cannot.
    */
  def curriculumOrder(docs: DataFrame): DataFrame = {
    val toks = graft.core.Tables.spread(docs)
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens"),
        hash32.as("h"))
    graft.operators.SeqNumber
      .withSeq(toks, Seq(col("n_tokens"), col("h"), col("doc_id")), "pos")
      .orderBy(col("pos"))
  }

  /** DSIR-style importance selection (Xie et al., NeurIPS 2023 "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw doc by how target-like its hashed-unigram distribution
    * is, and keep the top `topK`. The target distribution is estimated
    * from the in-corpus docs matching `targetValue` on `targetCol`
    * (e.g. the high-resource language or a trusted source) — the
    * standard "select web data that looks like Wikipedia" move.
    *
    * Departure from the paper, on purpose: DSIR's importance weight is
    * the log-likelihood ratio sum; libm log is not correctly rounded
    * and differs across engines, so the per-occurrence term here is
    * the RAW Laplace-smoothed probability ratio
    * `((tc+1)/(ttot+B)) / ((rc+1)/(rtot+B))` and the doc score is its
    * MEAN over occurrences — the [[TextAnalysis.lmQualityScore]]
    * no-libm convention: at matched feature counts the mean-ratio
    * ranks the way the mean-log does, and every arithmetic step
    * (two correctly-rounded IEEE divisions, one multiply, floor) is
    * bit-identical in both engines. Per-doc sums are
    * `floor(ratio * 2^40)` longs — order-independent across
    * partitions. Envelope: target is a subset of raw so
    * tc <= rc, hence ratio <= (rtot+B)/(ttot+B); with a target >= 1%
    * of the corpus the per-occurrence term is < 2^47 and a doc needs
    * > 2^16 words to approach Long overflow — far beyond the fixture
    * and still 10^4 docs of headroom at a 100x skinnier target.
    *
    * Scale shape: ONE pass over the exploded words builds the
    * bucketed-feature count table (B buckets, partial-aggregable);
    * the raw and target counts and their totals all derive from it;
    * the per-doc score attaches each occurrence's ratio by a
    * B-row-table equi-join (hot by construction — B is small — so
    * shuffle-hash, never sort-merge); topK is a TakeOrdered. No
    * window, no all-pairs, nothing corpus-sized on the driver.
    */
  def dsirSelect(docs: DataFrame, targetCol: String, targetValue: String,
                 nBuckets: Int, topK: Int): DataFrame = {
    require(nBuckets >= 2 && topK >= 1, "nBuckets >= 2, topK >= 1")
    val Q = 1099511627776.0 // 2^40
    val occ = graft.core.Tables.spread(docs)
      .select(col("doc_id"),
        (col(targetCol) === targetValue).as("is_tgt"),
        explode(TextOps.words(col("text"))).as("w"))
      .select(col("doc_id"), col("is_tgt"),
        pmod(graft.functions.Hashing.h32(col("w")), lit(nBuckets.toLong)).as("h"))
      .cpGuard() // read by the feature counts AND the score join
    val feat = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tc"))
      .cpGuard() // read by totals AND the ratio table
    val totals = feat.agg(sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"))
    val ratio = feat.crossJoin(broadcast(totals))
      .select(col("h"),
        (((col("tc") + 1L).cast("double") / (col("ttot") + nBuckets.toLong).cast("double"))
          / ((col("rc") + 1L).cast("double") / (col("rtot") + nBuckets.toLong).cast("double")))
          .as("ratio"))
    occ.join(ratio.hint("shuffle_hash"), "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(floor(col("ratio") * lit(Q))).as("s"))
      .select(col("doc_id"), col("n_words"),
        (col("s").cast("double") / col("n_words").cast("double") / lit(Q))
          .as("mean_imp"))
      .orderBy(col("mean_imp").desc, col("doc_id"))
      .limit(topK)
  }

  /** Per-epoch deterministic training shuffle: epoch e's order is the
    * dense rank of the portable hash h32("e:doc_id") — a
    * content-determined pseudo-random permutation that is (a) fully
    * reproducible (restarts and stragglers recompute identical
    * positions — no RNG state to ship), (b) different every epoch, and
    * (c) assigned by the [[graft.operators.SeqNumber]] range-partition
    * primitive, never an unpartitioned row_number window. Epochs
    * materialize independently (one balanced range exchange each), so
    * the planner can produce any epoch on demand.
    *
    * Output: (epoch, doc_id, h, pos) with pos dense 1..N per epoch.
    */
  def epochShuffle(docs: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 1, "epochs >= 1")
    val base = docs.select(col("doc_id"))
    (0 until epochs).map { e =>
      val keyed = base.withColumn("epoch", lit(e))
        .withColumn("h", graft.functions.Hashing.h32(
          concat(lit(e.toString), lit(":"), col("doc_id").cast("string"))))
      graft.operators.SeqNumber.withSeq(keyed,
        Seq(col("h"), col("doc_id")), "pos")
    }.reduce(_ unionByName _)
      .select(col("epoch"), col("doc_id"), col("h"), col("pos"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** One-row corpus DATASHEET — the dataset-card numbers (Gebru et al.,
    * "Datasheets for Datasets") a training corpus ships with: size,
    * token volume, shingle vocabulary, exact-dup count, corpus stopword
    * rate and language concentration (Herfindahl index), every one in
    * exact integer / 2^20 fixed point so the card is bit-reproducible.
    * Each statistic is one key-partitioned aggregation over the scan it
    * needs; the five 1-row summaries then broadcast-combine.
    *
    * Output: (n_docs, n_ws_tokens, vocab, n_distinct_texts,
    * stop_rate_fp, lang_hhi_fp).
    */
  def corpusDatasheet(docs: DataFrame): DataFrame = {
    val S = 1L << 20
    val spread = graft.core.Tables.spread(docs).cpGuard()
    val base = spread.agg(count(lit(1)).as("n_docs"),
      sum(size(TextOps.words(col("text"))).cast("long")).as("n_ws_tokens"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"))
    val vocab = spread
      .select(explode(TextOps.wordShingles(col("text"), Dedup.ShingleSize))
        .as("s"))
      .agg(countDistinct(col("s")).as("vocab"))
    val stop = spread
      .withColumn("__q", graft.functions.QualityCountsOf(col("text"),
        TextAnalysis.stopwords.flatMap(_._2)))
      .agg(sum(col("__q.n_words").cast("long")).as("sw"),
        sum(col("__q.n_stop").cast("long")).as("ss"))
      .select(expr(s"(ss * $S) div sw").as("stop_rate_fp"))
    val hhi = spread.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      .crossJoin(broadcast(spread.agg(count(lit(1)).as("n"))))
      .select(expr(s"(nl * $S) div n").as("share_fp"))
      .agg(expr(s"CAST(sum(share_fp * share_fp) div $S AS BIGINT)")
        .as("lang_hhi_fp"))
    base.crossJoin(broadcast(vocab)).crossJoin(broadcast(stop))
      .crossJoin(broadcast(hhi))
      .select(col("n_docs"), col("n_ws_tokens"), col("vocab"),
        col("n_distinct_texts"), col("stop_rate_fp"), col("lang_hhi_fp"))
  }

  /** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
    * 1998: a doc's shard is argmax over shards of the portable
    * h32("doc:shard"). Unlike `doc_id % n`, growing the fleet from n to
    * n+1 shards moves only the docs whose NEW shard wins the argmax —
    * an expected 1/(n+1) of the corpus — so a shard-count change
    * re-ships a sliver, not everything. Pure projection (the argmax is
    * a greatest-of-literals fold, no join, no shuffle); emitted here
    * for two fleet sizes with the moved flag so the stability claim is
    * itself an oracle-checked VALUE.
    *
    * Output: (doc_id, shard_before, shard_after, moved).
    */
  def rendezvousShards(docs: DataFrame, nBefore: Int,
                       nAfter: Int): DataFrame = {
    require(nBefore >= 1 && nAfter >= 1, "shard counts >= 1")
    def assign(n: Int): Column = {
      // argmax by (hash, shard) — total order, deterministic ties
      val scored = (0 until n).map { sh =>
        struct(graft.functions.Hashing.h32(
          concat(col("doc_id").cast("string"), lit(s":$sh"))).as("h"),
          lit(sh).as("sh"))
      }
      greatest(scored: _*).getField("sh")
    }
    graft.core.Tables.spread(docs)
      .select(col("doc_id"),
        assign(nBefore).as("shard_before"),
        assign(nAfter).as("shard_after"))
      .withColumn("moved", col("shard_before") =!= col("shard_after"))
      .orderBy(col("doc_id"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, one
    * multiplicative-weights step, linearized): per-domain excess
    * signal -> adjusted mixture weights. The trained proxy's excess
    * LOSS is replaced by an engine-native excess signal — each
    * domain's stopword rate vs the corpus rate (domains cleaner than
    * average get up-weighted, boilerplate-heavy domains get
    * down-weighted) — but the SHAPE is DoReMi's: baseline weight
    * (domain size) times (1 + eta * excess), floored at 10% of
    * baseline so no domain is starved to zero, renormalized.
    *
    * All signal math is exact integer fixed point (scale 2^20): rates
    * are `(count * S) div total` on non-negative longs, the eta step
    * is a pure integer multiply (no division, so no trunc-vs-floor
    * divergence on negative excess), and the only doubles are the two
    * final single-division shares. Shuffle shape: one groupBy(domain)
    * + two 1-row broadcast attaches — domains are few by definition,
    * the corpus scan dominates at 100 TB.
    *
    * Output: (source, n_docs, stop_rate_fp, delta_fp, w_raw, weight).
    */
  def domainReweight(docs: DataFrame, etaNum: Long = 2L): DataFrame = {
    val S = 1L << 20
    val floorFp = S / 10
    val counted = graft.core.Tables.spread(docs)
      .withColumn("__q", graft.functions.QualityCountsOf(col("text"),
        TextAnalysis.stopwords.flatMap(_._2)))
      .select(col("source"), col("__q.n_words").as("n_words"),
        col("__q.n_stop").as("n_stop"))
    val dom = counted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sw"), sum(col("n_stop")).as("ss"))
    val tot = dom.agg(sum(col("sw")).as("tw"), sum(col("ss")).as("ts"))
    val weighted = dom.crossJoin(broadcast(tot))
      .withColumn("stop_rate_fp", expr(s"(ss * $S) div sw"))
      .withColumn("delta_fp",
        expr(s"$etaNum * ((ts * $S) div tw - stop_rate_fp)"))
      .withColumn("w_raw",
        col("n_docs") * greatest(lit(S) + col("delta_fp"), lit(floorFp)))
      .cpGuard() // feeds its own total; never recompute the scan
    val wtot = weighted.agg(sum(col("w_raw")).as("wtot"))
    weighted.crossJoin(broadcast(wtot))
      .select(col("source"), col("n_docs"), col("stop_rate_fp"),
        col("delta_fp"), col("w_raw"),
        (col("w_raw").cast("double") / col("wtot").cast("double"))
          .as("weight"))
      .orderBy(col("source"))
  }

  /** UniMax language-budget allocation (Chung et al. 2023): split a
    * total token budget across languages so no language exceeds
    * maxEpochs passes over its own data, and the freed-up budget
    * water-fills the larger languages — the fairer alternative to
    * temperature sampling for multilingual pretraining. Exact integer
    * water-filling: languages sorted by capped supply ascending; each
    * takes min(cap, floor(remaining / languagesLeft)). All BIGINT, so
    * the allocation is bit-reproducible and sums to <= budget with a
    * deterministic remainder.
    *
    * Shape: one corpus scan -> groupBy(lang) token totals (languages
    * are FEW by nature — the bounded-collect contract, same as
    * centroids); the sequential fold over the collected totals is
    * O(#languages) driver work. Output per language: (lang, n_tokens,
    * cap, alloc, epochs = alloc/n_tokens) ordered by lang.
    */
  def unimaxAllocation(docs: DataFrame, budget: Long,
                       maxEpochs: Int): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1, "budget >= 0, maxEpochs >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = graft.core.Tables.spread(docs)
      .select(col("lang"), size(TextOps.words(col("text"))).cast("long").as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (lang, n) => (n * maxEpochs, lang) } // supply asc, ties by lang
    var remaining = budget
    val rows = totals.zipWithIndex.map { case ((lang, n), i) =>
      val cap = n * maxEpochs
      val alloc = math.min(cap, remaining / (totals.length - i))
      remaining -= alloc
      (lang, n, cap, alloc)
    }
    rows.toSeq.toDF("lang", "n_tokens", "cap", "alloc")
      .withColumn("epochs",
        col("alloc").cast("double") / col("n_tokens").cast("double"))
      .orderBy(col("lang"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer quota
    * across strata — the eval-set / labeling-budget allocator that
    * hands out EXACTLY `total` slots proportionally: stratum i gets
    * floor(total * n_i / N) plus one extra for the (total - sum of
    * floors) largest remainders (ties broken by stratum name, so the
    * allocation is a pure function of the counts). All arithmetic
    * exact BIGINT; the invariant sum(quota) == total holds by
    * construction.
    *
    * Shape: one groupBy(stratum) count, then the apportionment fold
    * over the collected per-stratum counts (strata are FEW by nature —
    * the [[unimaxAllocation]] bounded-collect contract).
    */
  def apportionQuota(docs: DataFrame, stratumCol: String,
                     total: Long): DataFrame = {
    require(total >= 0, "total >= 0")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = graft.core.Tables.spread(docs)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bigN = counts.map(_._2).sum
    val rows =
      if (bigN == 0L) Array.empty[(String, Long, Long, Long, Long)]
      else {
        val base = counts.map { case (st, n) =>
          (st, n, total * n / bigN, total * n % bigN)
        }
        val leftover = total - base.map(_._3).sum
        val extras = base.sortBy { case (st, _, _, rem) => (-rem, st) }
          .take(leftover.toInt).map(_._1).toSet
        base.map { case (st, n, fl, rem) =>
          val extra = if (extras.contains(st)) 1L else 0L
          (st, n, fl, extra, fl + extra)
        }
      }
    rows.toSeq.toDF("stratum", "n_docs", "floor_q", "extra", "quota")
      .orderBy(col("stratum"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002) —
    * the re-identification risk report a corpus needs before
    * publication: every equivalence class of the quasi-identifier
    * tuple with FEWER than k members is a risky class (its members are
    * distinguishable down to < k candidates). Quasi-identifiers here
    * are the metadata a release actually carries: lang, source, and a
    * character-length band (exact lengths are themselves identifying,
    * which is why the band is part of the audit).
    *
    * One partial-aggregable groupBy over the corpus; the risky-class
    * report is by construction smaller than the class count. Output:
    * one row per risky class (lang, source, len_band, n) plus the
    * class is ordered for stable comparison.
    */
  def kAnonymityAudit(docs: DataFrame, k: Long,
                      bandWidth: Long = 256L): DataFrame = {
    require(k >= 2 && bandWidth >= 1, "k >= 2, bandWidth >= 1")
    graft.core.Tables.spread(docs)
      .select(col("lang"), col("source"),
        expr(s"CAST(n_chars div $bandWidth AS BIGINT)").as("len_band"))
      .groupBy(col("lang"), col("source"), col("len_band"))
      .agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") < k)
      .orderBy(col("lang"), col("source"), col("len_band"))
  }

  /** Gini coefficient of a shard-size distribution — the one-number
    * balance audit for any sharding plan (c13's byte-budget shards,
    * c21's rendezvous shards): 0 = perfectly even, ->1 = one shard
    * holds everything; straggler risk in a single scalar. Computed by
    * the sorted-rank identity G = sum_i((2i - n - 1) x_(i)) /
    * (n * sum x): exact BIGINT numerator/denominator, ONE double
    * division. Shard counts are FEW by construction (each holds a
    * byte budget), so the sort is a bounded driver-side fold — the
    * [[unimaxAllocation]]/[[apportionQuota]] contract. Tied sizes
    * contribute a rank-assignment-independent coefficient sum, so the
    * value is deterministic without a tiebreak.
    */
  def shardGini(shards: DataFrame, sizeCol: String): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val xs = shards.select(col(sizeCol).cast("long")).as[Long]
      .collect().sorted
    val n = xs.length.toLong
    val tot = xs.sum
    val num = xs.zipWithIndex
      .map { case (x, i) => (2L * (i + 1) - n - 1) * x }.sum
    val gini =
      if (n == 0 || tot == 0) None
      else Some(num.toDouble / (n * tot).toDouble)
    Seq((n, tot, gini)).toDF("n_shards", "total_chars", "gini")
  }

  /** Iterative proportional fitting (IPF / raking, Deming & Stephan
    * 1940) of per-document sampling weights to TWO marginals at once
    * (equal-share language and source targets): alternately rescale
    * weights so each language's weighted mass, then each source's,
    * matches its target. The two-constraint generalization of c18's
    * single-marginal domain reweighting — the mixture tool when a
    * corpus must hit language quotas AND source quotas simultaneously
    * (no closed form exists; IPF converges to the max-entropy
    * fit).
    *
    * Determinism: weights live in u20 fixed point (units of 2^-20);
    * every rescale is one integer floor division
    * w' = w * target // marginal_sum — BIGINT throughout, so rounds
    * are bit-reproducible and the oracle unrolls the identical
    * integer recurrence. Scale shape: per round, two partial-
    * aggregable marginal groupBys + two broadcast joins of the (tiny)
    * marginal tables; weights never leave the executors.
    */
  def ipfRaking(docs: DataFrame, rounds: Int = 2,
                scale: Long = 1L << 20): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val d = graft.core.Tables.spread(docs)
      .select(col("doc_id"), col("lang"), col("source")).cpGuard()
    // bounded-collect scalars (the unimaxAllocation contract): corpus
    // size and marginal cardinalities set the integer targets
    val Array(n, nLang, nSrc) = d
      .agg(count(lit(1)), countDistinct(col("lang")),
        countDistinct(col("source")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val tLang = n * scale / nLang
    val tSrc = n * scale / nSrc
    var w = d.withColumn("w", lit(scale))
    for (_ <- 0 until rounds) {
      val cl = w.groupBy(col("lang")).agg(sum(col("w")).as("c"))
      w = w.join(broadcast(cl), "lang")
        .withColumn("w", expr(s"w * ${tLang}L div c")).drop("c")
        .cpGuard()
      val cs = w.groupBy(col("source")).agg(sum(col("w")).as("c"))
      w = w.join(broadcast(cs), "source")
        .withColumn("w", expr(s"w * ${tSrc}L div c")).drop("c")
        .cpGuard()
    }
    w.select(col("doc_id"), col("w").as("weight_u20"))
      .orderBy(col("doc_id"))
  }

  /** Systematic (low-variance) weighted resampling WITH replacement —
    * the particle-filter resampling step applied to corpus selection:
    * lay every document's weight on a number line (exclusive prefix
    * sums in doc_id order), then probe at the n equidistant midpoints
    * pos_i = floor((2i+1)·W / 2n); doc j is drawn once per probe
    * landing in [cum_j, cum_j + w_j). Expected draw count is exactly
    * n·w_j/W with variance strictly below multinomial sampling — and
    * unlike rand()-based draws it is seedless-deterministic, so the
    * oracle verifies every draw. Zero-weight docs are never drawn.
    *
    * Scale shape: the prefix sum is the range-partitioned two-pass
    * [[PrefixSum.withRunningSum]] (no global window); the probe table
    * is n rows broadcast against the cumulative scan (one map-side
    * containment join, no shuffle of the corpus); W attaches as a
    * 1-row broadcast. Envelope: (2n+1)·W must fit Long — W is corpus
    * total chars, fine to exabyte scale.
    */
  def systematicResample(docs: DataFrame, weightCol: String,
                         n: Int): DataFrame = {
    require(n >= 1 && n <= (1 << 20), s"n $n out of range")
    val wd = docs.select(col("doc_id"),
      col(weightCol).cast("long").as("w"))
    val cum = PrefixSum.withRunningSum(wd, Seq(col("doc_id")), "w",
      "cum_lo")
    val tot = wd.agg(sum(col("w")).as("W"))
    val probes = docs.sparkSession.range(n).toDF("probe")
      .crossJoin(broadcast(tot))
      .selectExpr("CAST(probe AS INT) AS probe",
        s"(2 * probe + 1) * W div ${2L * n} AS pos")
    cum.join(broadcast(probes),
        col("pos") >= col("cum_lo") && col("pos") < col("cum_lo") + col("w"))
      .select(col("probe"), col("pos"), col("doc_id"),
        col("w").as("weight"))
      .orderBy(col("probe"))
  }

  /** Greedy maximum-coverage selection (the facility-location /
    * submodular data-selection shape, Nemhauser-Wolsey-Fisher 1978):
    * pick `k` documents one at a time, each round the doc covering the
    * most NOT-yet-covered distinct word bigrams (ties → lowest
    * doc_id). The classic (1−1/e)-approximate core of coverage-based
    * corpus selection — "pick few docs that span the phrase space"
    * (bigrams, not unigrams: the synthetic corpus' unigram vocabulary
    * is one-doc-coverable, and real coverage selection shingles too).
    *
    * Distribution shape: per round ONE anti-join (exploded tokens vs
    * the covered-token set — the covered set is the vocabulary of ≤k
    * chosen docs, broadcast-sized by construction) + ONE
    * partial-aggregable groupBy(doc_id) + a 1-row TakeOrdered collect;
    * k is small and fixed, so driver work is k bounded single-row
    * picks, never a corpus materialization. The token table is built
    * once and localCheckpointed; rounds never rescan `documents`.
    */
  def maxCoverSelect(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, s"k $k out of range")
    val spark = docs.sparkSession
    val tok = graft.core.Tables.spread(docs)
      .select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 2)).as("w"))
      .cpGuard() // wordShingles is per-doc distinct already
    var chosen = Vector.empty[(Int, Long, Long, Long)]
    var chosenIds = Vector.empty[Long]
    var done = false
    // running coverage: tok is per-doc DISTINCT, so the winner's gain
    // (its shingles not yet covered) IS the coverage increment —
    // covered_total(r) = covered_total(r-1) + gain(r) exactly, which
    // removes one corpus-wide distinct-count job per greedy round
    // (k jobs; at 100 TB each was a full pass + shuffle)
    var coveredTotal = 0L
    import spark.implicits._
    for (round <- 1 to k if !done) {
      // the chosen set joins as a broadcast TABLE, not an isin literal:
      // an isin of k ids re-plans a growing O(k^2) cumulative literal
      // each round, while the broadcast hash join keeps the plan
      // constant-size at any k (the 100 TB chosen-set shape)
      val chosenDf = broadcast(chosenIds.toDF("doc_id"))
      val covered = tok
        .join(chosenDf, Seq("doc_id")).select(col("w"))
      val top = tok
        .join(chosenDf, Seq("doc_id"), "left_anti")
        .join(broadcast(covered), Seq("w"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc_id")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (id, gain) = (top(0).getLong(0), top(0).getLong(1))
        chosenIds :+= id
        coveredTotal += gain
        chosen :+= ((round, id, gain, coveredTotal))
      }
    }
    chosen.toDF("round", "doc_id", "gain", "covered_total")
      .orderBy(col("round"))
  }

  /** Benford first-significant-digit audit (Newcomb 1881, Benford
    * 1938) of a positive numeric column — the fabricated-data /
    * synthetic-leak detector: organically multiplicative magnitudes
    * (prices, populations, file sizes) follow P(d) = log10(1 + 1/d);
    * uniform or hand-typed numbers do not, and the per-digit gaps say
    * which.
    *
    * Exactness: the first digit comes from the EXACT cents integer
    * (decimal(18,2) cast, never float string-formatting); the nine
    * Benford probabilities are shortest-roundtrip DECIMAL LITERALS —
    * both engines parse the identical literal to the identical double,
    * where a runtime log10 could differ by an ulp between libms.
    * share = n/N is one IEEE division; abs_gap one subtraction.
    *
    * Scale shape: one partial-aggregable groupBy over 9 digit keys, a
    * 1-row total broadcast, and a 9-row literal frame left join — scan
    * throughput at any corpus size. Output: (digit, n, share,
    * benford_p, abs_gap), digits 1..9 always present.
    */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val benford = Seq(
      1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829992, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514).toDF("digit", "benford_p")
    val g = df
      .select((valueCol.cast("decimal(18,2)") * 100).cast("long").as("c"))
      .filter(col("c") > 0L)
      .select(substring(col("c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = g.agg(sum(col("n")).as("nn"))
    benford.join(g, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)).cast("double") /
          col("nn").cast("double")).as("share"),
        col("benford_p"),
        abs(coalesce(col("n"), lit(0L)).cast("double") /
          col("nn").cast("double") - col("benford_p")).as("abs_gap"))
      .orderBy(col("digit"))
  }

  /** Pareto-frontier (skyline) document selection over two maximize
    * objectives: length (`n_chars`) and lexical diversity (distinct
    * word count) — "keep every doc no other doc beats on BOTH axes",
    * the non-arbitrary alternative to a weighted quality scalar when
    * the axes aren't commensurable (Börzsönyi et al. ICDE'01).
    *
    * Scale shape: exact-duplicate (x, y) pairs collapse first (one
    * partial-aggregable groupBy), then the 2-d skyline is ONE
    * range-partitioned exclusive running max over (x desc, y desc)
    * order ([[graft.operators.PrefixSum.withRunningMax]] — no
    * unpartitioned window, no pairwise dominance join): a distinct
    * pair is on the frontier iff every earlier pair in that order has
    * a strictly smaller y (earlier ⟹ x' > x, or x' = x with y' > y,
    * so "high-water mark >= y" is exactly "dominated"). Duplicated
    * (x, y) points don't dominate each other (the strict-in-one
    * convention): membership rejoins ALL docs of each frontier pair.
    *
    * Output: frontier docs (doc_id, n_chars, n_distinct_words),
    * doc_id ascending.
    */
  def skylineSelect(docs: DataFrame): DataFrame = {
    val m = graft.core.Tables.spread(docs)
      .select(col("doc_id"), col("n_chars").cast("long").as("x"),
        size(array_distinct(TextOps.words(col("text")))).cast("long")
          .as("y"))
      .cpGuard() // feeds the pair dedup AND the membership rejoin
    val pairs = m.groupBy(col("x"), col("y")).agg(count(lit(1)).as("nd"))
    val ranked = PrefixSum.withRunningMax(pairs,
      Seq(col("x").desc, col("y").desc), "y", "hw")
    val frontier = ranked.filter(col("hw").isNull || col("hw") < col("y"))
      .select(col("x"), col("y"))
    m.join(frontier, Seq("x", "y"))
      .select(col("doc_id"), col("x").as("n_chars"),
        col("y").as("n_distinct_words"))
      .orderBy(col("doc_id"))
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2006) — the
    * sensitive-attribute companion to [[kAnonymityAudit]]: a release
    * can be k-anonymous (every quasi-identifier group is large) and
    * still leak, if a group's SENSITIVE value is homogeneous. Here the
    * quasi-identifier is (lang, len_band) and the sensitive attribute
    * is `source`: report every group seen by fewer than `l` distinct
    * sources, with its row count (the c24 convention: the audit lists
    * the failures; empty result = the release passes).
    *
    * One groupBy with a distinct-count — partial-aggregable, skew
    * bounded by the (lang × band) key space.
    */
  def lDiversityAudit(docs: DataFrame, l: Long,
                      bandWidth: Long = 256L): DataFrame = {
    require(l >= 2 && bandWidth >= 1, "l >= 2, bandWidth >= 1")
    graft.core.Tables.spread(docs)
      .select(col("lang"),
        expr(s"CAST(n_chars div $bandWidth AS BIGINT)").as("len_band"),
        col("source"))
      .groupBy(col("lang"), col("len_band"))
      .agg(countDistinct(col("source")).as("n_distinct_sources"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_distinct_sources") < l)
      .orderBy(col("lang"), col("len_band"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * distributional member completing the [[kAnonymityAudit]] /
    * [[lDiversityAudit]] triad: a group can hold `l` distinct sensitive
    * values and still leak if its DISTRIBUTION over them diverges from
    * the table's. Same quasi-identifier (lang, len_band) and sensitive
    * attribute (`source`); distance = total variation, as the exact
    * rational TV = Σ_v |n_cv·N − N_v·n_c| / (2·n_c·N). Values absent
    * from a class contribute N_v·n_c without a row; folding Σ_v N_v =
    * N turns the full-domain sum into n_c·N + Σ_{v∈class}(|n_cv·N −
    * N_v·n_c| − N_v·n_c) — no domain cross join, only the class's own
    * cells. Threshold compares cross-multiplied integers (tv_num·tDen
    * > tNum·tv_den), no float edge.
    *
    * Scale shape: one groupBy for cells, one for class sizes, one for
    * the global histogram (broadcast-size: distinct sensitive values),
    * a 1-row total; cell·N products in DECIMAL(38,0) (counts multiply
    * past 2⁶³ long before 100 TB), BIGINT at the output edge.
    *
    * Output: the VIOLATING classes (t > tNum/tDen), with exact
    * numerator/denominator and the read-edge IEEE t.
    */
  def tClosenessAudit(docs: DataFrame, tNum: Int, tDen: Int,
                      bandWidth: Long = 256L): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, "0 < tNum/tDen < 1")
    val d38 = "decimal(38,0)"
    val base = graft.core.Tables.spread(docs)
      .select(col("lang"),
        expr(s"CAST(n_chars div $bandWidth AS BIGINT)").as("len_band"),
        col("source"))
      .cpGuard() // feeds cells, class sizes, histogram, and the total
    val cell = base.groupBy(col("lang"), col("len_band"), col("source"))
      .agg(count(lit(1)).as("ncv"))
    val ncls = cell.groupBy(col("lang"), col("len_band"))
      .agg(sum(col("ncv")).as("nc"))
    val glob = base.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    val tot = base.agg(count(lit(1)).as("nn"))
    cell
      .join(broadcast(glob), Seq("source"))
      .join(ncls, Seq("lang", "len_band"))
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("len_band"), col("nc"), col("nn"),
        (abs(col("ncv").cast(d38) * col("nn")
            - col("nv").cast(d38) * col("nc"))
          - col("nv").cast(d38) * col("nc")).as("term"))
      .groupBy(col("lang"), col("len_band"), col("nc"), col("nn"))
      .agg(sum(col("term")).as("adj"))
      .select(col("lang"), col("len_band"), col("nc").as("n_rows"),
        (col("nc").cast(d38) * col("nn") + col("adj"))
          .cast("long").as("tv_num"),
        (lit(2) * col("nc").cast(d38) * col("nn"))
          .cast("long").as("tv_den"))
      .filter(col("tv_num") * tDen > col("tv_den") * tNum)
      .withColumn("t_closeness",
        col("tv_num").cast("double") / col("tv_den").cast("double"))
      .orderBy(col("lang"), col("len_band"))
  }

  /** Concat-and-split sequence PACKING — the Megatron/GPT pretraining
    * layout: all documents concatenate in doc_id order into one token
    * stream, cut into fixed `budget`-token training sequences, docs
    * straddling a boundary allowed (that IS the concat-packing
    * trade-off this audits; [[packDocs]] is the no-straddle per-doc
    * binning sibling, [[chunkDocs]] the per-doc window cutter). Per sequence: how many docs contribute,
    * the first/last doc ids, the exact token fill, and how many of its
    * docs started in an earlier sequence (the straddle count a
    * packing-quality review reads).
    *
    * Scale shape: the global token offset is the EXCLUSIVE
    * range-partitioned [[PrefixSum.withRunningSum]] (never a
    * single-task window — the q30b/SeqNumber discipline); each doc
    * then explodes into the sequences it touches (fan-out
    * ⌈n_tok/budget⌉+1, bounded) and one partial-aggregable groupBy
    * builds the per-sequence audit. All exact integers.
    */
  def concatPacking(docs: DataFrame, budget: Long = 256L): DataFrame = {
    require(budget >= 1, "budget >= 1")
    val counted = graft.core.Tables.spread(docs)
      .select(col("doc_id"),
        size(graft.ext.TextOps.words(col("text"))).cast("long").as("n_tok"))
    val off = PrefixSum.withRunningSum(
      counted, Seq(col("doc_id").asc), "n_tok", "off")
    off
      .withColumn("seq", explode(sequence(
        expr(s"off div $budget"),
        expr(s"(off + n_tok - 1) div $budget"))))
      .groupBy(col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(least(col("off") + col("n_tok"), (col("seq") + 1) * budget) -
          greatest(col("off"), col("seq") * budget)).as("n_tokens"),
        sum(when(col("off") < col("seq") * budget, 1L).otherwise(0L))
          .as("n_straddle"))
      .orderBy(col("seq"))
  }

  /** Deterministic URL plant for [[urlDomainCurate]] (the t35/m03
    * closed-form fixture discipline): one URL per doc by doc_id % 7,
    * covering the cases a canonicalizer must survive — mixed-case
    * scheme/host, default ports (:80/:443) vs a real :8080, userinfo,
    * duplicate slashes, empty path, tracking params leading /
    * trailing / alone, fragments, a multi-label public suffix
    * (co.uk), and an IDN punycode label (passes through lowercased,
    * never decoded).
    */
  def urlPlant(docs: DataFrame): DataFrame = {
    val d = col("doc_id").cast("string")
    docs.withColumn("url",
      when(col("doc_id") % 7 === 0, concat(
        lit("HTTP://WWW.Example.COM:80/Path/item?utm_source=feed&id="),
        d, lit("#frag")))
      .when(col("doc_id") % 7 === 1, lit("https://news.example.org/a/b"))
      .when(col("doc_id") % 7 === 2, concat(
        lit("https://user:pw@Shop.Example.co.uk:443//sale/"), d))
      .when(col("doc_id") % 7 === 3, concat(
        lit("http://blog.example.net:8080/?gclid=g"), d))
      .when(col("doc_id") % 7 === 4, concat(
        lit("https://XN--Bcher-KVA.ch/B%C3%BCcher?ref=ad&q="), d))
      .when(col("doc_id") % 7 === 5, lit("http://example.com"))
      .otherwise(concat(
        lit("https://m.example.com/p?fbclid=x&a="), d,
        lit("&utm_medium=soc&b=2"))))
  }

  /** Literal public-suffix subset (a documented SNAPSHOT of the
    * two-label country-code registry suffixes from the public suffix
    * list at publicsuffix.org — the list Mozilla maintains and every
    * crawler ships a copy of): a host's registered domain is one label
    * plus the matching suffix. Snapshot scope, documented: two-label
    * suffixes of the major ccTLD registries only; wildcard rules
    * (`*.ck`) and 3+-label suffixes (`act.edu.au`) are outside the
    * snapshot, and generic TLDs need no entry (their registered domain
    * is the plain last-2 fallback). This replaces the round-13
    * public-suffix-LITE heuristic ("co/com/org/net/ac/gov/edu under
    * any 2-char TLD"), which both missed real registries (go.jp,
    * ne.jp, govt.nz, gob.mx) and invented non-existent ones (ac.ch).
    */
  val PslSubset: Seq[String] = Seq(
    // uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    // jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "health.nz",
    "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz",
    "parliament.nz", "school.nz",
    // br
    "art.br", "blog.br", "com.br", "edu.br", "gov.br", "mil.br",
    "net.br", "org.br",
    // in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "org.in", "res.in",
    // za
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    // cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    // kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    // tw / hk / sg / my / id / th
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    // il / ua / pl / tr
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl", "org.pl", "waw.pl",
    "av.tr", "bbs.tr", "com.tr", "edu.tr", "gov.tr", "mil.tr", "net.tr",
    "org.tr",
    // mx / ar / co / ve / pe / ec
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar", "net.ar",
    "org.ar",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.ve", "edu.ve", "gob.ve", "net.ve", "org.ve",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "med.ec", "mil.ec",
    "net.ec", "org.ec")

  /** URL canonicalization (RFC 3986 §6 syntax-based normalization +
    * the crawl-dedup conventions, cf. the C4/CommonCrawl pipelines):
    * scheme and host lowercase; userinfo stripped; default ports
    * (http:80, https:443) dropped, others kept; fragment dropped;
    * empty path → `/`, duplicate slashes collapsed; tracking params
    * (`utm_*`, `gclid`, `fbclid`, `ref`) removed with surviving-param
    * ORDER preserved; percent-encoding and punycode pass through
    * untouched (never decoded — decoding is lossy across engines).
    * Registered domain: the host's last two labels, or three when the
    * last two form a public suffix in the literal [[PslSubset]]
    * snapshot (longest-match within the snapshot's 2-label scope).
    *
    * Pure regexp/array built-ins in one narrow projection — no UDF,
    * no shuffle — so normalization runs at scan speed ahead of the
    * dedup stages that key on it; the suffix lookup is a literal IN
    * over the snapshot, codegen'd into the projection.
    */
  def urlNormalize(df: DataFrame): DataFrame = {
    val suffixes = PslSubset.map(s => s"'$s'").mkString(", ")
    df
      .withColumn("scheme",
        lower(regexp_extract(col("url"), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("__rest",
        regexp_extract(col("url"), "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1))
      .withColumn("__hostport", regexp_extract(
        regexp_extract(col("__rest"), "^([^/?#]*)", 1), "([^@]*)$", 1))
      .withColumn("host",
        lower(regexp_extract(col("__hostport"), "^([^:]*)", 1)))
      .withColumn("__port0",
        regexp_extract(col("__hostport"), ":([0-9]+)$", 1))
      .withColumn("port", when(
        (col("scheme") === "http" && col("__port0") === "80") ||
          (col("scheme") === "https" && col("__port0") === "443"),
        lit("")).otherwise(col("__port0")))
      .withColumn("__pathq",
        regexp_extract(col("__rest"), "^[^/?#]*([^#]*)", 1))
      .withColumn("path", {
        val p0 = regexp_extract(col("__pathq"), "^([^?]*)", 1)
        when(p0 === "", lit("/")).otherwise(regexp_replace(p0, "/+", "/"))
      })
      .withColumn("query_norm", expr(
        """array_join(filter(split(
             regexp_extract(__pathq, '[?](.*)$', 1), '&'),
           p -> p <> '' AND NOT p rlike
             '^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$'), '&')"""))
      .withColumn("norm_url", concat(col("scheme"), lit("://"), col("host"),
        when(col("port") === "", lit("")).otherwise(concat(lit(":"), col("port"))),
        col("path"),
        when(col("query_norm") === "", lit(""))
          .otherwise(concat(lit("?"), col("query_norm")))))
      .withColumn("domain", expr(
        s"""CASE WHEN size(split(host, '[.]')) >= 3
              AND concat_ws('.', element_at(split(host, '[.]'), -2),
                element_at(split(host, '[.]'), -1)) IN ($suffixes)
            THEN concat_ws('.', element_at(split(host, '[.]'), -3),
              element_at(split(host, '[.]'), -2),
              element_at(split(host, '[.]'), -1))
            WHEN size(split(host, '[.]')) >= 2
            THEN concat_ws('.', element_at(split(host, '[.]'), -2),
              element_at(split(host, '[.]'), -1))
            ELSE host END"""))
      .drop("__rest", "__hostport", "__port0", "__pathq")
  }

  /** Canonical-URL exact dedup — the crawl stage between URL
    * normalization and content dedup: two fetches of the same
    * canonical URL are the same page (modulo recrawl drift), so
    * URL-group collapse removes the cheapest duplicate class before
    * any shingling runs. Groups on [[urlNormalize]]'s `norm_url`;
    * representative = lowest doc_id (the first fetch — deterministic,
    * the dedup families' keeper rule); reports every group with its
    * size, keeper, dropped count, and the registered domain the
    * per-domain audit keys on.
    *
    * Shape: ONE partial-aggregable groupBy(norm_url) over the
    * normalization's narrow map — no joins, no windows; at 100 TB the
    * exchange carries one row per distinct URL.
    */
  def urlDedup(docs: DataFrame): DataFrame =
    urlNormalize(graft.core.Tables.spread(docs))
      .groupBy(col("norm_url"), col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("keep_doc"),
        (count(lit(1)) - 1L).as("n_dropped"))
      .filter(col("n_docs") > 1)
      .orderBy(col("norm_url"))

  /** Per-domain crawl curation over [[urlNormalize]]: each doc carries
    * its canonical URL and registered domain, plus the domain's doc
    * count and an over-cap verdict (domain share > `capSharePct`% of
    * the corpus — the per-domain cap every crawl mix audit enforces so
    * one host cannot dominate a training set).
    *
    * Shape: normalization is a narrow map; ONE partial-aggregable
    * groupBy(domain) builds the rollup; the corpus total is a 1-row
    * broadcast attach (declared BNLJ); the rollup joins back on
    * domain as a plain equi-join (domains ≪ docs — broadcastable at
    * any corpus scale).
    */
  def urlDomainCurate(docs: DataFrame, capSharePct: Int = 20): DataFrame = {
    require(capSharePct >= 0 && capSharePct <= 100, "capSharePct in [0,100]")
    val normed = urlNormalize(graft.core.Tables.spread(docs)).cpGuard()
    val total = normed.agg(count(lit(1)).as("__total"))
    val roll = normed.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"),
        countDistinct(col("norm_url")).as("domain_urls"))
      .crossJoin(broadcast(total))
      .withColumn("over_cap",
        col("domain_docs") * 100 > col("__total") * capSharePct)
      .drop("__total")
    normed.select("doc_id", "url", "norm_url", "domain")
      .join(roll, Seq("domain"))
      .select(col("doc_id"), col("url"), col("norm_url"), col("domain"),
        col("domain_docs"), col("domain_urls"), col("over_cap"))
      .orderBy(col("doc_id"))
  }

  /** Per-domain crawl-politeness budget audit — the OTHER half of
    * crawl curation next to [[urlDomainCurate]]'s share cap: a fetch
    * log (domain, ts) is audited against a LITERAL per-domain
    * crawl-delay policy table (the robots.txt `Crawl-delay` contract,
    * cf. the IETF robots exclusion protocol RFC 9309 — the policy
    * itself is an input, fetched out-of-engine like K6's upload):
    *
    *  - burst profile: fetches per hour window (epoch-ms div 3600000 —
    *    integer bucketing, no calendar/zone traps), window count and
    *    the burstiest window;
    *  - compliance: consecutive same-domain fetch gaps (exact ms via
    *    unix_millis) vs the domain's delay — violations counted, the
    *    minimum observed gap reported;
    *  - frontier budget: least(share cap, politeness cap), where
    *    share cap = `capSharePct`% of total fetches (the c38 rule) and
    *    politeness cap = audit-span div delay + 1 (the max fetches a
    *    compliant crawler could even issue) — the next crawl round's
    *    per-domain allocation.
    *
    * Shape: one narrow projection; ONE domain-PARTITIONED window for
    * the gaps (domains ≪ fetches, skew bounded by the share cap
    * itself); two partial-aggregable groupBys; the global span/total
    * is a 1-row broadcast attach (declared BNLJ, the c38 discipline).
    * All integer math — exact in any engine.
    */
  /** Attach the per-domain crawl-delay `delay_ms` under a policy
    * table — ONE definition shared by [[crawlPoliteness]],
    * [[fetchSchedule]] and the streaming twin
    * ([[graft.streaming.StreamPoliteness]]), whose outputs must agree
    * row for row: delay resolution drifting between them would
    * silently break the split-cohort equivalence their spec pins.
    *
    * Shape: ONE broadcast left equi-join on domain + a coalesce to the
    * default — the r15 form (a when-chain LITERAL folded into the
    * projection) was fine at the plant's handful of domains but a
    * plan-blowing expression at a real frontier's millions of
    * delay-bearing domains; the join form costs the same here and is
    * the only shape that survives that scale (the policy side is one
    * bounded row per delay-bearing crawled domain — broadcast by
    * contract, never corpus-sized).
    */
  private[graft] def withDelayMs(df: DataFrame,
                                 policy: Seq[(String, Long)],
                                 defaultDelayMs: Long): DataFrame = {
    require(policy.map(_._1).distinct.size == policy.size &&
      policy.forall(_._2 > 0) && defaultDelayMs > 0,
      "policy domains distinct, delays positive")
    withBoundedDim(df, policy, "__policy_delay_ms")
      .withColumn("delay_ms",
        coalesce(col("__policy_delay_ms"), lit(defaultDelayMs)))
      .drop("__policy_delay_ms")
  }

  /** Attach one nullable LONG column `name` from a bounded (domain,
    * value) dimension via a broadcast left equi-join — the shared
    * shape under [[withDelayMs]] and the c45 Visit-time cap.
    */
  private[graft] def withBoundedDim(df: DataFrame,
                                    dim: Seq[(String, Long)],
                                    name: String): DataFrame =
    if (dim.isEmpty) df.withColumn(name, lit(null).cast("long"))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(dim.toDF("domain", name)), Seq("domain"), "left")
    }

  def crawlPoliteness(fetches: DataFrame, policy: Seq[(String, Long)],
                      defaultDelayMs: Long = 600000L,
                      capSharePct: Int = 20): DataFrame = {
    require(capSharePct >= 0 && capSharePct <= 100, "capSharePct in [0,100]")
    val f = fetches
      .select(col("domain"), unix_millis(col("ts")).as("ms"))
      .cpGuard() // read thrice: gaps, burst profile, 1-row span/total
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("ms"))
    val gapRoll = withDelayMs(
        f.withColumn("gap", col("ms") - lag(col("ms"), 1).over(w)),
        policy, defaultDelayMs)
      .groupBy(col("domain"))
      .agg(max(col("delay_ms")).as("crawl_delay_ms"), // functional on domain
        count(lit(1)).as("n_fetches"),
        sum(when(col("gap") < col("delay_ms"), 1L).otherwise(0L))
          .as("n_violations"),
        min(col("gap")).as("min_gap_ms")) // null when a single fetch
    val burst = f
      .groupBy(col("domain"), expr("ms div 3600000").as("hr"))
      .agg(count(lit(1)).as("nh"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_windows"), max(col("nh")).as("max_per_window"))
    val tot = f.agg(count(lit(1)).as("__total"),
      (max(col("ms")) - min(col("ms"))).as("__span_ms"))
    gapRoll.join(burst, Seq("domain"))
      .crossJoin(broadcast(tot))
      .withColumn("share_cap", expr(s"__total * $capSharePct div 100"))
      .withColumn("politeness_cap",
        expr("__span_ms div crawl_delay_ms + 1"))
      .withColumn("budget", least(col("share_cap"), col("politeness_cap")))
      .withColumn("compliant", col("n_violations") === 0L)
      .withColumn("over_budget", col("n_fetches") > col("budget"))
      .select(col("domain"), col("n_fetches"), col("n_windows"),
        col("max_per_window"), col("crawl_delay_ms"), col("n_violations"),
        col("min_gap_ms"), col("share_cap"), col("politeness_cap"),
        col("budget"), col("compliant"), col("over_budget"))
      .orderBy(col("domain"))
  }

  /** Deterministic robots.txt plant for [[robotsParse]] (the t35/m03
    * closed-form fixture discipline): one fetched robots.txt per doc
    * by doc_id % 5, covering the cases a parser must survive — a `*`
    * group with a STACKED co-agent header line (the §2.2.1 shared-body
    * form that empties the group under naive next-header scoping), a
    * delay and multiple Disallows; a full `Disallow: /`
    * block with no delay; a MULTI-GROUP file where a named agent's
    * rules precede the `*` group (the named group's paths must not
    * leak into the `*` policy) plus a Sitemap line; a missing
    * robots.txt; and a malformed group (non-numeric delay, empty
    * Disallow = allow-all per the RFC 9309 grammar).
    */
  def robotsPlant(docs: DataFrame): DataFrame = {
    val nl = lit("\n")
    docs.withColumn("robots_txt",
      when(col("doc_id") % 5 === 0, concat(
        lit("User-agent: *"), nl, lit("User-agent: otherbot"), nl,
        lit("Crawl-delay: 10"), nl,
        lit("Disallow: /private"), nl, lit("Disallow: /tmp")))
      .when(col("doc_id") % 5 === 1, concat(
        lit("User-agent: *"), nl, lit("Disallow: /")))
      .when(col("doc_id") % 5 === 2, concat(
        lit("User-Agent: googlebot"), nl, lit("Disallow: /a"), nl, nl,
        lit("User-agent: *"), nl, lit("Crawl-delay: 5"), nl,
        lit("Allow: /public"), nl, lit("Disallow: /x"), nl,
        lit("Sitemap: https://example.com/s.xml")))
      .when(col("doc_id") % 5 === 3, lit(""))
      .otherwise(concat(
        lit("User-agent: *"), nl, lit("Crawl-delay: soon"), nl,
        lit("Disallow:"))))
  }

  /** robots.txt policy extraction (RFC 9309 — the Robots Exclusion
    * Protocol): per fetched file, the `User-agent: *` group's
    * Crawl-delay (null when absent or non-numeric — the de-facto
    * extension c41's policy table consumes), Disallow/Allow rule
    * counts (empty Disallow = allow-all and does NOT count), the
    * full-block verdict (`Disallow: /`), and the file-scoped Sitemap
    * count. Group scoping is positional and header-RUN aware: a
    * group's header can be a stack of consecutive User-agent lines
    * (all sharing the body — RFC 9309 §2.2.1), so the body starts at
    * the first non-header line after the matched header and ends at
    * the next header after the body began — a named agent's rules
    * never leak into the `*` policy, and a stacked co-agent line never
    * empties it.
    *
    * Pure array/regexp built-ins in ONE narrow projection (split to
    * lines, first-index folds over a line-number sequence, slice,
    * filtered counts) — no UDF, no explode, no shuffle: at crawl scale
    * robots parsing rides the fetch scan. Character classes only (no
    * escaped metachars), so the regexes read identically in any
    * RE2-family engine.
    */
  def robotsParse(df: DataFrame): DataFrame = {
    val ls = "transform(split(robots_txt, '\n'), l -> lower(trim(l)))"
    df
      .withColumn("__ls", expr(ls))
      .withColumn("__star", expr(
        """try_element_at(filter(sequence(1, size(__ls)),
             i -> element_at(__ls, i) rlike '^user-agent:[ ]*[*]$'), 1)"""))
      .withColumn("__beg", expr(
        """coalesce(try_element_at(filter(sequence(1, size(__ls)),
             i -> i > __star AND NOT
               element_at(__ls, i) rlike '^user-agent:'), 1),
           size(__ls) + 1)"""))
      .withColumn("__nxt", expr(
        """try_element_at(filter(sequence(1, size(__ls)),
             i -> i >= __beg AND
               element_at(__ls, i) rlike '^user-agent:'), 1)"""))
      .withColumn("__grp", expr(
        """CASE WHEN __star IS NULL THEN array()
           ELSE slice(__ls, __beg,
             coalesce(__nxt, size(__ls) + 1) - __beg) END"""))
      .withColumn("has_robots", length(col("robots_txt")) > 0)
      .withColumn("crawl_delay_s", expr(
        """CAST(regexp_extract(
             try_element_at(filter(__grp,
               l -> l rlike '^crawl-delay:[ ]*[0-9]+[ ]*$'), 1),
             ':[ ]*([0-9]+)', 1) AS INT)"""))
      .withColumn("n_disallow", expr(
        "size(filter(__grp, l -> l rlike '^disallow:[ ]*/'))"))
      .withColumn("disallow_all", expr(
        "size(filter(__grp, l -> l rlike '^disallow:[ ]*/[ ]*$')) > 0"))
      .withColumn("n_allow", expr(
        "size(filter(__grp, l -> l rlike '^allow:[ ]*/'))"))
      .withColumn("n_sitemaps", expr(
        "size(filter(__ls, l -> l rlike '^sitemap:[ ]*[^ ]'))"))
      .drop("__ls", "__star", "__beg", "__nxt", "__grp")
  }

  /** c42: the parsed `*`-group policy per planted robots.txt — the
    * in-engine derivation of the literal policy table
    * [[crawlPoliteness]] consumes.
    */
  def robotsPolicy(docs: DataFrame): DataFrame =
    robotsParse(robotsPlant(graft.core.Tables.spread(docs)))
      .select(col("doc_id"), col("has_robots"), col("crawl_delay_s"),
        col("n_disallow"), col("disallow_all"), col("n_allow"),
        col("n_sitemaps"))
      .orderBy(col("doc_id"))

  // ---- c43: robots-rule URL admission (RFC 9309 §2.2.2) -------------
  //
  // c42 parses robots policies; this half ENFORCES them: every frontier
  // URL's path is evaluated against its registered domain's `*`-group
  // Allow/Disallow rules with longest-match precedence (Allow wins
  // ties — RFC 9309 §2.2.2: "the most specific match found MUST be
  // used ... the least restrictive rule"), so a compliant crawler never
  // fetches a disallowed path. Rule paths and URL paths are matched as
  // the percent-encoded OCTET strings both sides already carry (§2.2.2
  // matches octets; decoding either side would be lossy and is exactly
  // the class of cross-engine trap [[urlNormalize]] refuses).

  /** Deterministic per-DOMAIN robots.txt plant — one file per
    * registered domain of the doc_id % 7 [[urlPlant]] frontier (the
    * robots a crawler of that frontier would actually have fetched),
    * chosen so admission exercises every RFC 9309 §2.2.2 decision:
    * longest-match Allow overriding a shorter Disallow (example.com's
    * `/Path/item` under `Disallow: /Path`), case-sensitive paths
    * (`Disallow: /p` must not catch `/Path`), a full `Disallow: /`
    * block whose `*` group follows a NAMED group that must not leak
    * (example.org), an equal-length Allow/Disallow tie where Allow
    * wins (example.co.uk's `/sale`), empty-Disallow allow-all with a
    * Crawl-delay (example.net), and percent-encoded rule octets
    * matching the encoded path (the punycode host). Crawl-delays here
    * are what [[robotsDelayPolicy]] derives c41's policy table from.
    */
  val DomainRobots: Seq[(String, String)] = Seq(
    // example.com also carries a Request-rate whose implied delay
    // (ceil(10/2) = 5 s) is BELOW its Crawl-delay — the c49 compose
    // rule (max of the two) must keep 10 s, proving the extensions
    // never weaken an explicit Crawl-delay
    "example.com" -> Seq("User-agent: *", "Crawl-delay: 10",
      "Request-rate: 2/10",
      "Disallow: /Path", "Allow: /Path/item", "Disallow: /p",
      // self-advertisement — the common case c50's ledger discovers
      "Sitemap: https://example.com/sitemap.xml").mkString("\n"),
    // example.org advertises its own sitemap AND a news sitemap that
    // does not exist — c50's advertised-but-missing case
    "example.org" -> Seq("User-agent: googlebot", "Allow: /a", "",
      "User-agent: *", "Disallow: /",
      "Sitemap: https://example.org/sitemap.xml",
      "Sitemap: https://example.org/news-sitemap.xml").mkString("\n"),
    // example.co.uk has NO Crawl-delay: its 1-page-per-20-s
    // Request-rate alone yields the c49 effective delay (20 s), and
    // the Visit-time window (06:00-08:45 = 9 900 s) caps c45's
    // schedulable horizon for the domain
    "example.co.uk" -> Seq("User-agent: *", "Allow: /sale",
      "Disallow: /sale", "Request-rate: 1/20",
      "Visit-time: 0600-0845",
      "Sitemap: https://example.co.uk/sitemap.xml").mkString("\n"),
    "example.net" -> Seq("User-agent: *", "User-agent: googlebot",
      "Crawl-delay: 7", "Disallow:",
      // the sitemaps.org cross-submission advertisement: example.net
      // VOUCHES for example.com's sitemap, so foreign example.net locs
      // found there are trusted (c48); the line sits inside the group
      // body but Sitemap is file-scoped and the rule/delay extractors
      // ignore it either way. The self-advertisement below is c50's
      // ordinary discovery entry for example.net's own sitemap.
      "Sitemap: https://example.com/sitemap.xml",
      "Sitemap: https://example.net/sitemap.xml").mkString("\n"),
    "xn--bcher-kva.ch" -> Seq("User-agent: *", "Disallow: /B%C3%BCcher",
      "Allow: /B%C3%BCcher/free").mkString("\n"))

  /** The planted per-domain robots files as a DataFrame
    * (domain, robots_txt) — the tiny dimension side every admission
    * join broadcasts.
    */
  def domainRobots(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    DomainRobots.toDF("domain", "robots_txt")
  }

  /** Case-PRESERVING effective-group extraction over
    * (domain, robots_txt): [[robotsParse]] lowercases whole lines
    * (fine for counting), but rule PATHS are case-sensitive per
    * RFC 9309 §2.2.2 — so here only the directive match is case-folded
    * and the value keeps its original octets. Group selection follows
    * §2.2.1: a NAMED crawler (`agent`, matched case-insensitively as a
    * whole product token) uses the first group addressed to it and
    * falls back to the `*` group only when no group names it; the
    * default `agent = "*"` is the generic-crawler view every other
    * robots operator consumes. Adds `rules` (array of (is_allow,
    * rpath), empty Disallow excluded per the allow-all grammar rule)
    * and `crawl_delay_s` (null when absent or non-numeric). Pure
    * array/regexp built-ins, one narrow projection.
    */
  def robotsRules(df: DataFrame, agent: String = "*"): DataFrame = {
    require(agent == "*" || agent.matches("^[a-z0-9-]+$"),
      "agent: '*' or a lowercase product token")
    val named =
      if (agent == "*") "CAST(NULL AS INT)"
      else s"""try_element_at(filter(sequence(1, size(__ls)),
             i -> lower(element_at(__ls, i))
                    rlike '^user-agent:[ ]*$agent$$'), 1)"""
    df
      .withColumn("__ls",
        expr("transform(split(robots_txt, '\n'), l -> trim(l))"))
      .withColumn("__star", expr(s"""coalesce($named,
           try_element_at(filter(sequence(1, size(__ls)),
             i -> lower(element_at(__ls, i))
                    rlike '^user-agent:[ ]*[*]$$'), 1))"""))
      // a group's header can be a RUN of stacked User-agent lines (all
      // those agents share the body — §2.2.1); the body begins at the
      // first non-header line after the matched header and ends at the
      // next header AFTER the body began
      .withColumn("__beg", expr(
        """coalesce(try_element_at(filter(sequence(1, size(__ls)),
             i -> i > __star AND NOT
               lower(element_at(__ls, i)) rlike '^user-agent:'), 1),
           size(__ls) + 1)"""))
      .withColumn("__nxt", expr(
        """try_element_at(filter(sequence(1, size(__ls)),
             i -> i >= __beg AND
               lower(element_at(__ls, i)) rlike '^user-agent:'), 1)"""))
      .withColumn("__grp", expr(
        """CASE WHEN __star IS NULL THEN array()
           ELSE slice(__ls, __beg,
             coalesce(__nxt, size(__ls) + 1) - __beg) END"""))
      .withColumn("rules", expr(
        """transform(
             filter(__grp, l -> lower(l) rlike '^(dis)?allow:[ ]*/'),
             l -> struct(lower(l) rlike '^allow:' AS is_allow,
                         trim(substring(l, instr(l, ':') + 1)) AS rpath))"""))
      .withColumn("crawl_delay_s", expr(
        """CAST(regexp_extract(
             try_element_at(filter(__grp,
               l -> lower(l) rlike '^crawl-delay:[ ]*[0-9]+[ ]*$'), 1),
             ':[ ]*([0-9]+)', 1) AS INT)"""))
      // de-facto extension lines (pre-RFC wild-robots reality c49
      // honors): `Request-rate: n/m` = n requests per m seconds, an
      // implied per-request delay of ceil(m/n) s; `Visit-time:
      // HHMM-HHMM` = the daily window the site invites fetches in.
      // Both group-scoped like Crawl-delay; malformed values parse to
      // null (the RFC 9309 ignore-what-you-don't-understand rule)
      .withColumn("__rr", expr(
        """try_element_at(filter(__grp,
             l -> lower(l) rlike '^request-rate:[ ]*[0-9]+/[0-9]+[ ]*$'), 1)"""))
      .withColumn("rate_num", expr(
        "CAST(regexp_extract(__rr, ':[ ]*([0-9]+)/', 1) AS INT)"))
      .withColumn("rate_den_s", expr(
        "CAST(regexp_extract(__rr, '/([0-9]+)', 1) AS INT)"))
      .withColumn("rate_delay_s", expr(
        "CAST((rate_den_s + rate_num - 1) div rate_num AS INT)"))
      .withColumn("__vt", expr(
        """try_element_at(filter(__grp,
             l -> lower(l) rlike '^visit-time:[ ]*[0-9]{4}-[0-9]{4}[ ]*$'), 1)"""))
      .withColumn("visit_from_min", expr(
        """CAST(regexp_extract(__vt, ':[ ]*([0-9]{2})', 1) AS INT) * 60 +
           CAST(regexp_extract(__vt, ':[ ]*[0-9]{2}([0-9]{2})', 1) AS INT)"""))
      .withColumn("visit_to_min", expr(
        """CAST(regexp_extract(__vt, '-([0-9]{2})[0-9]{2}[ ]*$', 1) AS INT) * 60 +
           CAST(regexp_extract(__vt, '-[0-9]{2}([0-9]{2})[ ]*$', 1) AS INT)"""))
      // the c49 compose rule: rate caps and Crawl-delay stack via max
      // (a crawler must honor the STRICTER of the two); null only when
      // neither is present, so the delay policy can tell "no opinion"
      // from "delay 0"
      .withColumn("effective_delay_s", expr(
        """CASE WHEN crawl_delay_s IS NULL AND rate_delay_s IS NULL
           THEN NULL
           ELSE greatest(coalesce(crawl_delay_s, 0),
                         coalesce(rate_delay_s, 0)) END"""))
      .drop("__ls", "__star", "__beg", "__nxt", "__grp", "__rr", "__vt")
  }

  /** The c41 policy table DERIVED in-engine from the planted robots
    * files (closing the c42 → c41 seam): domains whose `*` group
    * carries a numeric Crawl-delay OR a Request-rate map to the c49
    * EFFECTIVE delay (max of the two, ·1000 ms); the rest fall to the
    * caller's default. The collect is bounded by construction — one
    * row per CRAWLED DOMAIN with a delay (the frontier's domain
    * registry, never the corpus), the [[graft.ext.TextAnalysis]]
    * trained-vocab collect discipline.
    */
  def robotsDelayPolicy(
      spark: org.apache.spark.sql.SparkSession): Seq[(String, Long)] =
    robotsRules(domainRobots(spark))
      .filter(col("effective_delay_s").isNotNull)
      .select(col("domain"),
        (col("effective_delay_s").cast("long") * 1000L).as("delay_ms"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)

  /** The per-domain Visit-time WINDOW table (window length in ms) for
    * domains advertising one — the c45 horizon cap. Bounded by the
    * same contract as [[robotsDelayPolicy]].
    */
  def robotsVisitPolicy(
      spark: org.apache.spark.sql.SparkSession): Seq[(String, Long)] =
    robotsRules(domainRobots(spark))
      .filter(col("visit_from_min").isNotNull)
      .select(col("domain"),
        ((col("visit_to_min") - col("visit_from_min")).cast("long") *
          60000L).as("visit_ms"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)

  /** c49: the parsed de-facto rate extensions per crawled domain —
    * Request-rate (n/m and its implied ceil(m/n)-second delay),
    * Visit-time (daily HHMM window as minutes-since-midnight), and
    * the composed effective delay ([[robotsRules]]' max rule) that
    * [[robotsDelayPolicy]] feeds c41/c45. One broadcast-size dimension
    * row per domain; nulls where a file carries no extension.
    */
  def robotsRateExtensions(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    robotsRules(domainRobots(spark))
      .select(col("domain"), col("crawl_delay_s"), col("rate_num"),
        col("rate_den_s"), col("rate_delay_s"), col("visit_from_min"),
        col("visit_to_min"), col("effective_delay_s"))
      .orderBy(col("domain"))

  /** Attach the RFC 9309 §2.2.2 admission verdict to any frontier
    * carrying (domain, path, query_norm): match target = path +
    * ('?' + surviving query) — §2.2.2 matches the path-and-query
    * octets; a rule matches iff the target starts with the rule path;
    * the WINNING rule maximizes (length, is_allow, rpath) — longest
    * match first, Allow beating Disallow at equal length, the last key
    * a pure determinism tie-break. No match (or no robots file for the
    * domain) = allowed, the RFC default. Adds (target, matched_rule,
    * matched_allow, allowed); every input row and column survives.
    *
    * Shape: ONE broadcast equi-join on domain attaches the domain's
    * whole rule ARRAY (#rules per domain is robots-file-bounded), then
    * the winner is a narrow filter/array_max fold over that array — no
    * explode, no re-aggregation, no extra shuffle: admission rides the
    * frontier scan, which is what lets it sit INSIDE the c40 chain for
    * free at 100 TB.
    */
  private[graft] def admissionVerdict(frontier: DataFrame,
                                      agent: String = "*"): DataFrame = {
    val rules = robotsRules(domainRobots(frontier.sparkSession), agent)
      .select(col("domain"), col("rules").as("__rules"))
    frontier
      .withColumn("target", concat(col("path"),
        when(col("query_norm") === "", lit(""))
          .otherwise(concat(lit("?"), col("query_norm")))))
      .join(broadcast(rules), Seq("domain"), "left")
      .withColumn("__best", expr(
        """array_max(transform(
             filter(__rules, r -> startswith(target, r.rpath)),
             r -> struct(length(r.rpath) AS l,
                         CAST(r.is_allow AS INT) AS a, r.rpath AS p)))"""))
      .withColumn("matched_rule", col("__best.p"))
      .withColumn("matched_allow",
        when(col("__best").isNotNull, col("__best.a") === 1))
      .withColumn("allowed",
        col("__best").isNull || col("__best.a") === 1)
      .drop("__rules", "__best")
  }

  /** c46: per-AGENT admission — RFC 9309 §2.2.1's group matching made
    * visible: the SAME frontier evaluated under each crawler identity
    * in `agents`, a named crawler using the first group addressed to
    * it (case-insensitive product token) and falling back to `*` only
    * where no group names it. The planted example.org file is the
    * signature case: its `*` group is a full block but its googlebot
    * group allows `/a` — so the generic crawler is locked out of
    * exactly the URLs googlebot may fetch, and a crawler that ignored
    * group selection would get BOTH verdicts wrong on one domain or
    * the other. Each agent's pass is the c43 shape (broadcast
    * rules-array attach + narrow fold); the union fans the frontier
    * once per agent (agents are a handful, by construction).
    */
  def robotsAgentAdmission(docs: DataFrame,
                           agents: Seq[String] = Seq("*", "googlebot"))
      : DataFrame = {
    require(agents.nonEmpty && agents.distinct.size == agents.size,
      "agents non-empty and distinct")
    val frontier = urlNormalize(urlPlant(graft.core.Tables.spread(docs)))
      .cpGuard() // one canonicalization pass, read once per agent
    agents.map { a =>
      admissionVerdict(frontier, a)
        .select(lit(a).as("agent"), col("doc_id"), col("norm_url"),
          col("domain"), col("target"), col("matched_rule"),
          col("allowed"))
    }.reduce(_ unionByName _)
      .orderBy(col("agent"), col("doc_id"))
  }

  /** Deterministic per-domain sitemap plant for [[sitemapFrontier]] —
    * the DISCOVERY side of the crawl chain (sitemaps.org protocol; the
    * Sitemap lines robots.txt advertises): each domain publishes a
    * small urlset whose locs exercise every discovery outcome — a
    * re-spelling of an already-crawled URL (canonicalizes into the
    * frontier → skip), a genuinely new allowed URL (fetch), a new URL
    * the domain's own robots rules disallow (never fetch), a full-block
    * domain's new URL, and a tracking-params-only re-spelling.
    */
  val DomainSitemaps: Seq[(String, String)] = Seq(
    "example.com" -> ("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>HTTP://WWW.Example.COM/Path/item?id=0</loc>" +
      "<lastmod>2026-01-01</lastmod></url>" +
      "<url><loc>https://www.example.com/Path/item/new</loc></url>" +
      "<url><loc>https://m.example.com/p2?x=1</loc></url>" +
      // cross-SUBMITTED locs (registered domain ≠ example.com — the
      // sitemaps.org cross-submission rule c48 adjudicates): the
      // example.net loc is TRUSTED because example.net's robots.txt
      // advertises this very sitemap; the example.co.uk loc is
      // UNTRUSTED (no advertisement) even though its own robots would
      // admit the path — trust and admission are separate gates
      "<url><loc>http://blog.example.net:8080/cross-ok</loc></url>" +
      "<url><loc>https://Shop.Example.co.uk/other</loc></url></urlset>"),
    "example.org" -> ("<?xml version=\"1.0\"?><urlset><url>" +
      "<loc>https://news.example.org/a/c</loc></url></urlset>"),
    "example.net" -> ("<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>http://blog.example.net:8080/fresh</loc></url>" +
      "<url><loc>http://blog.example.net:8080/?gclid=zz</loc>" +
      "<lastmod>2026-02-01</lastmod></url>" +
      "</urlset>"),
    "example.co.uk" -> ("<?xml version=\"1.0\"?><urlset><url>" +
      "<loc>https://Shop.Example.co.uk:443//sale/2</loc>" +
      "<lastmod>2025-06-15</lastmod></url></urlset>"))

  /** c44: sitemap URL discovery against the live frontier — the full
    * pre-fetch decision for every advertised loc: extract locs from
    * each domain's sitemap XML (regexp over `<loc>` elements — the
    * protocol requires them verbatim), canonicalize with the SAME
    * [[urlNormalize]] the frontier uses (discovery and dedup must
    * share one canon or re-spellings slip through), attach the c43
    * robots verdict, and mark locs whose canonical URL the crawler has
    * already fetched; `fetchable` = allowed AND unseen — exactly the
    * rows a scheduler hands to [[fetchSchedule]].
    *
    * Shape: the sitemap side is a literal dimension; the only corpus
    * touch is the seen-probe, planned as corpus ⋉ broadcast(locs)
    * LEFT-SEMI (the corpus streams, nothing corpus-sized shuffles or
    * broadcasts) and the tiny hit set re-attaches broadcast-size. At
    * stream scale the probe is the bucketed
    * [[graft.streaming.StreamUrlDedup]] state equi-join instead.
    */
  def sitemapFrontier(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val locs = DomainSitemaps.toDF("sm_domain", "sitemap_xml")
      .select(col("sm_domain"), explode(expr(
        "regexp_extract_all(sitemap_xml, '<loc>([^<]*)</loc>', 1)"))
        .as("url"))
    val discovered = admissionVerdict(urlNormalize(locs))
      .select(col("sm_domain"), col("url"), col("norm_url"), col("domain"),
        col("target"), col("matched_rule"), col("allowed"))
      .cpGuard() // read twice: the seen-probe build side and the output
    val seenHits = urlNormalize(urlPlant(graft.core.Tables.spread(docs)))
      .select(col("norm_url"))
      .join(broadcast(discovered.select(col("norm_url"))),
        Seq("norm_url"), "left_semi")
      .distinct()
      .withColumn("already_seen", lit(true))
    discovered
      .join(broadcast(seenHits), Seq("norm_url"), "left")
      .select(col("sm_domain"), col("url"), col("norm_url"), col("domain"),
        col("target"), col("matched_rule"), col("allowed"),
        coalesce(col("already_seen"), lit(false)).as("already_seen"))
      .withColumn("fetchable", col("allowed") && !col("already_seen"))
      .orderBy(col("norm_url"), col("url"))
  }

  /** File-scoped `Sitemap:` advertisements per robots.txt — RFC 9309
    * §2.3's "other records" as sitemaps.org consumes them: the line is
    * NOT group-scoped (any line anywhere in the file counts, whatever
    * User-agent group surrounds it), the directive is matched
    * case-insensitively and the URL value kept verbatim (sitemap URLs
    * are compared exactly; case-folding one would break the c48 trust
    * probe). Adds `sitemaps` (array, file order). One narrow
    * projection, no shuffle — rides whatever scan carries the robots
    * text.
    */
  def robotsSitemaps(df: DataFrame): DataFrame =
    df.withColumn("sitemaps", expr(
      "transform(filter(transform(split(robots_txt, '\n'), " +
        "l -> trim(l)), l -> lower(l) rlike '^sitemap:[ ]*[^ ]'), " +
        "l -> trim(substring(l, instr(l, ':') + 1)))"))

  /** c48: CROSS-DOMAIN sitemap discovery — the sitemaps.org
    * cross-submission rule c44 skips: a sitemap may list locs whose
    * registered domain is NOT the sitemap's own, and such a foreign
    * loc is trustworthy only when the loc's domain vouches for that
    * exact sitemap URL via a `Sitemap:` line in ITS robots.txt (the
    * cross-submission proof-of-ownership at sitemaps.org/protocol —
    * without it any site could inject arbitrary URLs into another
    * crawler budget). Per advertised loc: c44's canon + admission +
    * seen-probe, PLUS `is_foreign` (loc registered domain ≠
    * sm_domain) and `trusted` (same-domain locs implicitly; foreign
    * locs only with the advertisement); `fetchable` = trusted AND
    * allowed AND unseen — the trust gate fires before the crawler
    * spends anything on a foreign loc.
    *
    * Shape: c44's exactly — the locs AND the per-domain advertisement
    * table are broadcast-size dimensions (the latter is one
    * robots-file-bounded row per crawled domain), so the trust attach
    * is a second broadcast left join riding the same narrow
    * projection; the corpus is still touched only by the left-semi
    * seen-probe.
    */
  def sitemapCrossDiscovery(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val locs = DomainSitemaps.toDF("sm_domain", "sitemap_xml")
      .withColumn("sitemap_url",
        concat(lit("https://"), col("sm_domain"), lit("/sitemap.xml")))
      .select(col("sm_domain"), col("sitemap_url"), explode(expr(
        "regexp_extract_all(sitemap_xml, '<loc>([^<]*)</loc>', 1)"))
        .as("url"))
    val adverts = robotsSitemaps(domainRobots(spark))
      .select(col("domain"), col("sitemaps"))
    val discovered = admissionVerdict(urlNormalize(locs))
      .join(broadcast(adverts), Seq("domain"), "left")
      .withColumn("is_foreign", col("domain") =!= col("sm_domain"))
      .withColumn("trusted", !col("is_foreign") ||
        coalesce(array_contains(col("sitemaps"), col("sitemap_url")),
          lit(false)))
      .select(col("sm_domain"), col("url"), col("sitemap_url"),
        col("norm_url"), col("domain"), col("allowed"),
        col("is_foreign"), col("trusted"))
      .cpGuard() // read twice: the seen-probe build side and the output
    val seenHits = urlNormalize(urlPlant(graft.core.Tables.spread(docs)))
      .select(col("norm_url"))
      .join(broadcast(discovered.select(col("norm_url"))),
        Seq("norm_url"), "left_semi")
      .distinct()
      .withColumn("already_seen", lit(true))
    discovered
      .join(broadcast(seenHits), Seq("norm_url"), "left")
      .select(col("sm_domain"), col("url"), col("sitemap_url"),
        col("norm_url"), col("domain"), col("allowed"), col("is_foreign"),
        col("trusted"),
        coalesce(col("already_seen"), lit(false)).as("already_seen"))
      .withColumn("fetchable",
        col("trusted") && col("allowed") && !col("already_seen"))
      .orderBy(col("norm_url"), col("url"), col("sm_domain"))
  }

  /** Deterministic sitemap-INDEX plant for [[sitemapIndexExpand]] —
    * the protocol's second file type (sitemaps.org: a site past the
    * 50k-URL/50MB limit must split into child sitemaps listed by a
    * `<sitemapindex>`): each entry exercises one expansion outcome —
    * a child that exists (the domain's planted urlset, fresh lastmod),
    * a child that is advertised but missing (archive), a RE-SPELLING
    * of an existing child (canonicalizes to the same URL — the dedup
    * case), and a scheme-mismatched child (http vs the https content
    * address — advertised, canonicalizes, but nothing is there).
    */
  val DomainSitemapIndexes: Seq[(String, String)] = Seq(
    "example.com" -> ("<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>https://example.com/sitemap.xml</loc>" +
      "<lastmod>2026-02-10</lastmod></sitemap>" +
      "<sitemap><loc>https://example.com/sitemap-archive.xml</loc>" +
      "<lastmod>2025-01-01</lastmod></sitemap>" +
      "<sitemap><loc>HTTPS://Example.COM:443/sitemap.xml</loc>" +
      "</sitemap></sitemapindex>"),
    "example.net" -> ("<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>http://example.net/sitemap.xml</loc>" +
      "<lastmod>2026-03-01</lastmod></sitemap>" +
      "<sitemap><loc>https://example.net/sitemap.xml</loc>" +
      "<lastmod>2026-03-01</lastmod></sitemap></sitemapindex>"))

  /** c51: sitemap-INDEX expansion — the recursion step between robots
    * discovery (c50) and per-loc discovery (c44/c48): each
    * `<sitemapindex>` entry's child URL is extracted with its optional
    * lastmod, canonicalized by the SHARED canon, matched against the
    * sitemap content convention (`https://<domain>/sitemap.xml` — a
    * child advertised under another spelling or scheme either
    * collapses into the same canonical address or points at nothing),
    * deduplicated per index at the canonical level (first loc string
    * keeps), and scheduled: `refetch_due` iff the child exists, is the
    * keeper, and advertises a modification after the crawler's
    * `lastCrawl` watermark — c47's freshness rule applied at SITEMAP
    * granularity, which is exactly how a crawler prunes a 50k-child
    * index to the handful that changed.
    *
    * Shape: pure bounded dimensions end to end (indexes, entries,
    * content addresses are all robots-scale); ONE window partitioned
    * by (index domain, canonical child) for the dedup — no corpus
    * touch at all, the expansion feeds c44/c48 which own that.
    */
  def sitemapIndexExpand(spark: org.apache.spark.sql.SparkSession,
                         lastCrawl: String = "2025-12-31"): DataFrame = {
    require(lastCrawl.matches("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
      "lastCrawl: ISO date")
    import spark.implicits._
    val entries = DomainSitemapIndexes.toDF("index_domain", "index_xml")
      .select(col("index_domain"), explode(expr(
        "regexp_extract_all(index_xml, '<sitemap>(.*?)</sitemap>', 1)"))
        .as("b"))
      .select(col("index_domain"),
        expr("regexp_extract(b, '<loc>([^<]*)</loc>', 1)").as("url"),
        expr("""to_date(nullif(
          regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1), ''))""")
          .as("lastmod"))
    val contents = DomainSitemaps.toDF("c_domain", "sitemap_xml")
      .select(concat(lit("https://"), col("c_domain"),
        lit("/sitemap.xml")).as("content_url"), lit(true).as("found"))
    val grp = Window.partitionBy(col("index_domain"), col("norm_url"))
    val w = grp.orderBy(col("url"))
    // two spellings of one canonical child are ONE sitemap: the first
    // loc string keeps, but the GROUP's max advertised lastmod drives
    // the freshness verdict (the keeper may be the lastmod-less
    // spelling)
    urlNormalize(entries)
      .select(col("index_domain"), col("url"), col("norm_url"),
        col("lastmod"))
      .join(broadcast(contents),
        col("content_url") === col("norm_url"), "left")
      .withColumn("is_dup", row_number().over(w) > 1)
      .withColumn("__grp_lastmod", max(col("lastmod")).over(grp))
      .select(col("index_domain"), col("url").as("child_url"),
        col("norm_url").as("norm_child"), col("lastmod"),
        col("is_dup"), coalesce(col("found"), lit(false)).as("found"),
        (coalesce(col("found"), lit(false)) && !col("is_dup") &&
          col("__grp_lastmod").isNotNull &&
          col("__grp_lastmod") > to_date(lit(lastCrawl))).as("refetch_due"))
      .orderBy(col("index_domain"), col("norm_child"), col("child_url"))
  }

  /** c50: the robots-ADVERTISED sitemap discovery ledger — the
    * real-world ENTRY POINT the plant-driven c44/c48 skip: a crawler
    * learns which sitemaps exist from the file-scoped `Sitemap:` lines
    * in the robots files it already fetched, resolves each advertised
    * URL with the shared canon, fetches the ones that exist, and rolls
    * the per-loc c48 verdicts up into a per-advertisement ledger — the
    * operational summary a crawl operator reads (what was advertised,
    * by whom, was it there, and what did it yield). Columns per
    * (advertiser_domain, sitemap_url): `sm_domain` (the advertised
    * URL's registered domain), `self_advertised` (ordinary discovery
    * vs a cross-submission entry), `found` (content exists at the
    * canonical URL — an advertised-but-missing sitemap surfaces here
    * instead of vanishing), and the loc rollup (n_locs, n_fetchable,
    * n_blocked, n_seen, n_untrusted, all 0 when missing).
    *
    * Shape: every relation here except the c48 chain's seen-probe is a
    * robots-file-bounded dimension, so the two attaches are broadcast
    * left joins and the only corpus touch remains c48's left-semi
    * probe; the rollup is one partial-aggregable groupBy over the loc
    * dimension.
    */
  def sitemapLedger(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val resolved = urlNormalize(
        robotsSitemaps(domainRobots(spark))
          .select(col("domain").as("advertiser_domain"),
            explode(col("sitemaps")).as("url")))
      .select(col("advertiser_domain"), col("url"), col("norm_url"),
        col("domain").as("sm_domain"))
    val contents = DomainSitemaps.toDF("c_domain", "sitemap_xml")
      .select(concat(lit("https://"), col("c_domain"),
        lit("/sitemap.xml")).as("content_url"),
        lit(true).as("found"))
    val agg = sitemapCrossDiscovery(docs)
      .groupBy(col("sitemap_url").as("agg_url"))
      .agg(count(lit(1)).as("n_locs"),
        sum(when(col("fetchable"), 1L).otherwise(0L)).as("n_fetchable"),
        sum(when(!col("allowed"), 1L).otherwise(0L)).as("n_blocked"),
        sum(when(col("already_seen"), 1L).otherwise(0L)).as("n_seen"),
        sum(when(col("is_foreign") && !col("trusted"), 1L).otherwise(0L))
          .as("n_untrusted"))
    resolved
      .join(broadcast(contents),
        col("content_url") === col("norm_url"), "left")
      .join(broadcast(agg), col("agg_url") === col("norm_url"), "left")
      .select(col("advertiser_domain"), col("url").as("sitemap_url"),
        col("sm_domain"),
        (col("sm_domain") === col("advertiser_domain")).as("self_advertised"),
        coalesce(col("found"), lit(false)).as("found"),
        coalesce(col("n_locs"), lit(0L)).as("n_locs"),
        coalesce(col("n_fetchable"), lit(0L)).as("n_fetchable"),
        coalesce(col("n_blocked"), lit(0L)).as("n_blocked"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        coalesce(col("n_untrusted"), lit(0L)).as("n_untrusted"))
      .orderBy(col("advertiser_domain"), col("sitemap_url"))
  }

  /** c47: lastmod-aware RECRAWL priority — the freshness half of
    * sitemap consumption c44 ignores: per `<url>` block the optional
    * `<lastmod>` date is extracted next to the loc, and an
    * ALREADY-CRAWLED canonical URL is due for recrawl iff the site
    * advertises a modification AFTER the crawler's `lastCrawl`
    * watermark (sitemaps.org: lastmod is exactly the signal that lets
    * a crawler skip unchanged pages). Unseen locs are the fetch set,
    * not the recrawl set (recrawl_due = false there — c44 owns them);
    * a seen loc with no lastmod is NOT due (no evidence of change —
    * the conservative reading a polite crawler takes).
    *
    * Shape: c44's exactly — literal sitemap dimension, one narrow
    * `<url>`-block extraction (non-greedy spans, RE2-safe), the same
    * canonicalization, and the broadcast left-semi seen-probe as the
    * only corpus touch.
    */
  def recrawlPriority(docs: DataFrame,
                      lastCrawl: String = "2025-12-31"): DataFrame = {
    require(lastCrawl.matches("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
      "lastCrawl: ISO date")
    val spark = docs.sparkSession
    import spark.implicits._
    val locs = DomainSitemaps.toDF("sm_domain", "sitemap_xml")
      .select(col("sm_domain"), explode(expr(
        "regexp_extract_all(sitemap_xml, '<url>(.*?)</url>', 1)"))
        .as("b"))
      .select(col("sm_domain"),
        expr("regexp_extract(b, '<loc>([^<]*)</loc>', 1)").as("url"),
        expr("""to_date(nullif(
          regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1), ''))""")
          .as("lastmod"))
    val normed = urlNormalize(locs)
      .select(col("sm_domain"), col("url"), col("norm_url"), col("lastmod"))
      .cpGuard() // read twice: the seen-probe build side and the output
    val seenHits = urlNormalize(urlPlant(graft.core.Tables.spread(docs)))
      .select(col("norm_url"))
      .join(broadcast(normed.select(col("norm_url"))),
        Seq("norm_url"), "left_semi")
      .distinct()
      .withColumn("already_seen", lit(true))
    normed
      .join(broadcast(seenHits), Seq("norm_url"), "left")
      .select(col("sm_domain"), col("url"), col("norm_url"), col("lastmod"),
        coalesce(col("already_seen"), lit(false)).as("already_seen"))
      .withColumn("recrawl_due",
        col("already_seen") && col("lastmod").isNotNull &&
          col("lastmod") > to_date(lit(lastCrawl)))
      .orderBy(col("norm_url"), col("url"))
  }

  /** c45: politeness-aware fetch schedule over the admitted frontier —
    * what a frontier scheduler actually emits: per domain, the
    * robots-admitted canonical URLs take slots 0,1,2,… in
    * deterministic norm_url order, slot k fetching at k·delay ms from
    * the round start (the domain's [[robotsDelayPolicy]] effective
    * delay — Crawl-delay and Request-rate composed via max — or the
    * default), and slots past the domain's politeness capacity
    * (cap div delay + 1 where cap = min(horizon, the c49 Visit-time
    * window) — c41's formula under the schedulable span) are DEFERRED
    * to the next round rather than silently dropped.
    *
    * Shape: one partial-aggregable groupBy collapses the frontier to
    * canonical URLs, ONE domain-partitioned window assigns slots
    * (domains ≪ URLs; skew bounded by the share cap the c38 audit
    * enforces), then narrow integer math — exact in any engine.
    */
  def fetchSchedule(docs: DataFrame, horizonMs: Long = 3600000L,
                    defaultDelayMs: Long = 600000L): DataFrame = {
    require(horizonMs > 0 && defaultDelayMs > 0,
      "horizonMs and defaultDelayMs positive")
    val spark = docs.sparkSession
    val canon = admissionVerdict(
        urlNormalize(urlPlant(graft.core.Tables.spread(docs))))
      .groupBy(col("norm_url"), col("domain"))
      .agg(min(col("doc_id")).as("keep_doc"),
        max(col("allowed")).as("allowed")) // constant within a norm_url
      .filter(col("allowed"))
    val w = Window.partitionBy(col("domain")).orderBy(col("norm_url"))
    withBoundedDim(
        withDelayMs(canon.withColumn("slot", row_number().over(w) - 1),
          robotsDelayPolicy(spark), defaultDelayMs),
        robotsVisitPolicy(spark), "__visit_ms")
      .withColumn("sched_ms", col("slot").cast("long") * col("delay_ms"))
      // a domain advertising a Visit-time window (c49) caps its
      // schedulable span at min(horizon, window): a polite crawler
      // cannot spend the whole horizon on a site that only invites
      // fetches for part of it
      .withColumn("__cap_ms", least(lit(horizonMs),
        coalesce(col("__visit_ms"), lit(horizonMs))))
      .withColumn("deferred", expr("slot >= __cap_ms div delay_ms + 1"))
      .select(col("domain"), col("norm_url"), col("keep_doc"), col("slot"),
        col("delay_ms"), col("sched_ms"), col("deferred"))
      .orderBy(col("domain"), col("slot"))
  }

  /** c43: per-URL robots admission over the [[urlPlant]] frontier —
    * [[admissionVerdict]] plus the per-domain blocked count (what the
    * frontier scheduler subtracts from c41's budget). The blocked
    * rollup is a partial-aggregable groupBy(domain) re-joined
    * broadcast-size (domains ≪ URLs at any corpus scale).
    */
  def robotsAdmission(docs: DataFrame): DataFrame = {
    val verdicts = admissionVerdict(
        urlNormalize(urlPlant(graft.core.Tables.spread(docs))))
      .select(col("doc_id"), col("norm_url"), col("domain"), col("target"),
        col("matched_rule"), col("matched_allow"), col("allowed"))
      .cpGuard() // read twice: the verdict rows and the blocked rollup
    val blocked = verdicts.groupBy(col("domain"))
      .agg(sum(when(!col("allowed"), 1L).otherwise(0L))
        .as("domain_blocked"))
    verdicts.join(broadcast(blocked), Seq("domain"))
      .select(col("doc_id"), col("norm_url"), col("domain"), col("target"),
        col("matched_rule"), col("matched_allow"), col("allowed"),
        col("domain_blocked"))
      .orderBy(col("doc_id"))
  }
}
