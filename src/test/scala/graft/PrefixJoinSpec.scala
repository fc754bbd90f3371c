package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ext.{Dedup, TextOps}
import graft.functions.{MisraGries, MisraGriesAggregator}

/** Prefix-filtering exact similarity join (Dedup.prefixJaccardDup) and
  * the Misra-Gries heavy-hitters aggregator — the two round-7 additions
  * whose correctness claims are theorems (lossless candidate
  * generation; deterministic frequency bounds), checked here on random
  * and adversarial inputs beyond the fixed-fixture oracle gate.
  */
class PrefixJoinSpec extends SparkSpec {

  private val vocab = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private def forSamples[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  // corpora with planted near-dups at mixed lengths, so qualifying
  // pairs exist at several (|x|, |y|) shapes and the length filter and
  // prefix lengths are both exercised
  private val corpusGen: Gen[Seq[String]] = for {
    n <- Gen.choose(5, 10)
    bases <- Gen.listOfN(n,
      Gen.choose(4, 24).flatMap(l => Gen.listOfN(l, Gen.oneOf(vocab))))
    flags <- Gen.listOfN(n, Gen.choose(0, 2))
    idxs <- Gen.listOfN(n, Gen.choose(0, 1000))
    words <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield {
    val dups = bases.lazyZip(flags).lazyZip(idxs).lazyZip(words).flatMap {
      case (b, 1, _, _) => Some(b)
      case (b, 2, i, w) => Some(b.updated(i % b.size, w))
      case _ => None
    }
    (bases ++ dups).map(_.mkString(" "))
  }

  /** Driver-side exact reference: all pairs with shingle-set Jaccard
    * >= num/denom, compared as integers like the operator.
    */
  private def bruteForce(texts: Seq[String], num: Int, denom: Int)
      : Set[(Long, Long, Int)] = {
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < Dedup.ShingleSize) Set.empty
      else ws.sliding(Dedup.ShingleSize).map(_.mkString(" ")).toSet
    }
    val sets = texts.map(shingles)
    (for {
      a <- sets.indices; b <- sets.indices if a < b
      inter = (sets(a) & sets(b)).size
      uni = sets(a).size + sets(b).size - inter
      if uni > 0 && inter * denom >= uni * num
    } yield (a.toLong, b.toLong, inter)).toSet
  }

  test("prefixJaccardDup equals brute-force exact Jaccard (lossless)") {
    import spark.implicits._
    forSamples(corpusGen, 5) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.prefixJaccardDup(docs, num = 1, denom = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = bruteForce(texts, 1, 2)
      assert(got == want,
        s"prefix join diverged: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("prefixJaccardDup is lossless under hostile tokenization") {
    import spark.implicits._
    // runs of spaces create empty words that flow INTO shingles (both
    // engines keep them); docs shorter than the shingle width vanish
    val texts = Seq(
      "alpha bravo charlie delta echo",
      "alpha bravo charlie delta foxtrot",
      "alpha  bravo  charlie  delta", // double-space twin: different shingles
      "alpha  bravo  charlie  delta", // its exact copy
      "alpha bravo", // too short to shingle
      "", "  ")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.prefixJaccardDup(docs, num = 1, denom = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteForce(texts, 1, 2), s"hostile diverged: $got")
    assert(got.exists(p => p._1 == 2L && p._2 == 3L), "exact copies must pair")
  }

  test("PPJoin positional filter prunes candidates and stays lossless") {
    import spark.implicits._
    // docs 0/1 share exactly ONE 3-shingle ("c1 c2 c3"), which — being
    // the only df=2 token among df=1 tokens — ranks LAST (4 of 4) in
    // both rarest-first arrays. At t=1/4 the prefix is the whole array,
    // so AllPairs emits the (0,1) candidate; the positional bound
    // 1 + min(0, 0) = 1 < alpha = ceil(8/5) = 2 kills it. Docs 2/3 are
    // exact copies: their rank-1 collision passes the bound. True
    // Jaccard(0,1) = 1/7 < 1/4, so pruning loses nothing.
    val docs = Seq(
      (0L, "a1 a2 a3 c1 c2 c3"),
      (1L, "b1 b2 b3 c1 c2 c3"),
      (2L, "x1 x2 x3 x4"),
      (3L, "x1 x2 x3 x4")).toDF("doc_id", "text")
    val arrs = Dedup.prefixOrderedArrays(docs, 1, 4)
    def pairs(positional: Boolean) =
      Dedup.prefixCandidates(arrs, 1, 4, positional).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(positional = false) == Set((0L, 1L), (2L, 3L)))
    assert(pairs(positional = true) == Set((2L, 3L)),
      "positional filter must prune the late-rank collision")
    val out = Dedup.prefixJaccardDup(docs, 1, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == bruteForce(docs.collect().sortBy(_.getLong(0))
      .map(_.getString(1)).toSeq, 1, 4))
    assert(out.contains((2L, 3L, 2)))
  }

  test("prefixJaccardDup is lossless at a tight threshold too") {
    import spark.implicits._
    forSamples(corpusGen, 3) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.prefixJaccardDup(docs, num = 9, denom = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == bruteForce(texts, 9, 10))
    }
  }

  // ---- Misra-Gries ------------------------------------------------------

  test("MG guarantees hold for every partition layout (merge order)") {
    import spark.implicits._
    // skewed stream: token i has frequency ~ N/(i+1) (zipf-ish), vocab
    // 200 >> k = 8, so decrements and merge cuts both fire
    val stream = (0 until 200).flatMap(i => Seq.fill(600 / (i + 1))(s"tok$i"))
    val n = stream.size.toLong
    val k = 8
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(heavy.nonEmpty && heavy.size < k, s"fixture: ${heavy.size} heavy")
    for (parts <- Seq(1, 3, 8)) {
      val ds = spark.createDataset(stream).repartition(parts)
      val out = ds.select(MisraGries.heavyHitters(k)(col("value")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.tok"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k, s"summary over k at parts=$parts")
      heavy.foreach(t => assert(out.contains(t),
        s"heavy $t missing at parts=$parts"))
      out.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth && (truth - est) * (k + 1) <= n,
          s"bound violated for $t: est=$est true=$truth at parts=$parts")
      }
    }
  }

  test("MG merge cut keeps at most k counters and is a valid summary") {
    val agg = new MisraGriesAggregator(3)
    val x = Map("a" -> 5L, "b" -> 4L, "c" -> 1L)
    val y = Map("d" -> 3L, "e" -> 2L, "a" -> 1L)
    val m = agg.merge(x, y)
    // combined: a=6 b=4 d=3 e=2 c=1; cut = 4th largest = 2
    assert(m == Map("a" -> 4L, "b" -> 2L, "d" -> 1L))
  }

  // ---- audio ------------------------------------------------------------

  test("decodeAudio yields nulls on malformed payloads, values on real WAV") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val wav = graft.ext.Multimodal.syntheticAudio(docs)
    val broken = wav.withColumn("payload",
      when(col("doc_id") === 2L, lit("not a wav".getBytes))
        .otherwise(col("payload")))
    val out = graft.ext.Multimodal.decodeAudio(broken)
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(!out(1L) && out(2L) && !out(3L))
  }

  test("vocabGrowth cuts at doc RANK, not literal id (sparse/offset ids)") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    // 20 docs with ids 1000, 1010, ... — a literal `doc_id < 16` cut
    // would see ZERO docs at every checkpoint; the rank cut sees the
    // first 16 docs at checkpoint 16 and all 20 above it
    val docs = (0 until 20)
      .map(i => (1000L + 10 * i, s"tok$i " * 60)).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(16L)._1 > 0 && out(16L)._2 > 0, s"empty curve at cp 16: $out")
    assert(out(16L)._1 < out(64L)._1, "cp 16 must cut BELOW the full corpus")
    assert(out(64L) == out(16384L), "all 20 docs included from cp 64 up")
  }

  test("round-7 operators degrade to empty/zero on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Curation, Dedup, Graphs, Similarity, TextAnalysis}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val noEmbs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(Dedup.prefixJaccardDup(noDocs, 1, 2).count() == 0)
    assert(Dedup.dupClustersTwoPhase(noPairs).count() == 0)
    assert(TextAnalysis.noveltyScore(noDocs).count() == 0)
    assert(TextAnalysis.vocabGrowth(noDocs).collect()
      .forall(r => r.getLong(1) == 0 && r.getLong(2) == 0))
    assert(Similarity.dbscanLite(noEmbs, 0.3, 2).count() == 0)
    assert(Similarity.embeddingDrift(noEmbs, noEmbs).count() == 0)
    assert(Graphs.randomWalks(noEdges, 3).count() == 0)
    assert(Curation.rendezvousShards(noDocs, 4, 5).count() == 0)
    assert(Curation.epochShuffle(noDocs, 2).count() == 0)
    // MG over an empty stream: empty summary, not a crash
    val mg = spark.emptyDataset[String].toDF("tok")
      .agg(MisraGries.heavyHitters(4)(col("tok")).as("hh"))
      .select(explode(col("hh"))).count()
    assert(mg == 0)
  }

  test("round-8 operators degrade to empty/zero on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Curation, Dedup, Funnels, Graphs, Similarity, TextAnalysis}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noMeta = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noEmbs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    val noLabels = Seq.empty[(Long, Long)].toDF("k", "label")
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    assert(Dedup.substringSpans(noDocs, n = 5, minRun = 4).count() == 0)
    assert(TextAnalysis.boilerplateCoverage(noDocs).count() == 0)
    assert(TextAnalysis.boilerplateScrub(noDocs).count() == 0)
    assert(TextAnalysis.intraDocRepetition(noDocs).count() == 0)
    assert(Similarity.dbscanLsh(noEmbs, nPlanes = 8, threshold = 0.3,
      minPts = 2).count() == 0)
    assert(Curation.kAnonymityAudit(noMeta, k = 5).count() == 0)
    assert(Curation.unimaxAllocation(
      noMeta.select(col("doc_id"), col("text"), col("lang")),
      budget = 1000L, maxEpochs = 2).count() == 0)
    assert(Funnels.eventFunnel(noEvents, Seq("view", "click"), 60)
      .collect().map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(Funnels.retentionCohorts(
      noEvents.select(col("user_id"), col("ts"))).count() == 0)
    // empty graph: modularity is a single all-null-safe row, profile empty
    val q = Graphs.modularity(noEdges, noLabels).collect()
    assert(q.length == 1 && q(0).getLong(0) == 0L && q(0).isNullAt(3))
    assert(Graphs.communityProfile(noEdges, noLabels).count() == 0)
    // a single-frame unparseable "video" payload: prefix-parse, no crash
    val badVid = Seq((1L, Array[Byte](0, 0, 0, 1, 0, 0, 0, 4, 9, 9, 9, 9)))
      .toDF("doc_id", "payload")
    assert(graft.ext.Multimodal.videoFrameHashes(badVid, 1).count() == 0)
  }

  test("round-9 operators degrade to empty/zero on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Curation, Funnels, Similarity, TimeSeries}
    val noEvents = Seq
      .empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val noEmbs = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(TimeSeries.holt(noEvents).count() == 0)
    assert(TimeSeries.motif(noEvents).count() == 0)
    assert(Funnels.kaplanMeier(noEvents).count() == 0)
    assert(Similarity.silhouette(noEmbs).count() == 0)
    // Benford over all-nonpositive values: the 9-row literal frame
    // survives with zero counts (digits 1..9 always present)
    val bf = Curation.benfordAudit(Seq(0.0, -3.0).toDF("v"), col("v"))
      .collect()
    assert(bf.length == 9 && bf.forall(_.getLong(1) == 0L))
    // NSW over an empty corpus: no targets, no entry, empty result
    assert(Similarity.nswSearch(
      noEmbs.select(col("vec_id"), col("embedding")),
      nQueries = 1, g = 2, beam = 2, rounds = 2, k = 3).count() == 0)
  }

  test("round-11 operators degrade to empty/defined on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Curation, Graphs, Similarity, TextAnalysis, TimeSeries}
    val noEvents = Seq
      .empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val noDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(TimeSeries.intervalOverlap(noEvents).count() == 0)
    assert(TextAnalysis.encodingAudit(noDocs).count() == 0)
    assert(TextAnalysis.deflateLengths(noDocs).count() == 0)
    assert(Curation.concatPacking(noDocs).count() == 0)
    assert(Graphs.incrementalTriangles(noEdges, noEdges).count() == 0)
    // kmeans on an empty corpus fails loudly (the pcaPower contract)
    val noEmbs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.kmeansLloyd(noEmbs, k = 2, rounds = 1).collect()
    }
  }

  test("round-10 operators degrade to empty/defined on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Curation, Similarity, TextAnalysis, TimeSeries}
    val noEvents = Seq
      .empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noEmbs = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    // global agg: one all-zero/null row, rho null (zero rank variance)
    val Array(sp) = TimeSeries.spearmanHourly(noEvents).collect()
    assert(sp.getLong(0) == 0L && sp.isNullAt(4))
    assert(TimeSeries.bursts(noEvents, num = 5, den = 4).count() == 0)
    assert(TextAnalysis.yuleK(noDocs).count() == 0)
    assert(TextAnalysis.vocabCoverage(noDocs).count() == 0)
    assert(Curation.tClosenessAudit(noDocs, 2, 5).count() == 0)
    assert(Similarity.signHammingTopK(noEmbs, nQueries = 1, k = 3)
      .count() == 0)
  }

  test("audio fingerprint is amplitude-invariant and perturbation-sensitive") {
    import spark.implicits._
    import graft.ext.Multimodal
    // ids 3, 19, 35 share pattern 3 at amplitudes 1x, 2x, 3x; id 0 is
    // pattern 0 AND noisy (0 % 97 == 0) vs clean pattern-0 id 16
    val docs = Seq(3L, 19L, 35L, 0L, 16L).toDF("doc_id")
    val wav = Multimodal.syntheticAudioRenditions(docs)
    // renditions are byte-wise different WAVs
    val paySizes = wav.select(col("doc_id"), md5(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set(3L, 19L, 35L).map(paySizes).size == 3, "payloads not distinct")
    val fp = Multimodal.audioFingerprint64(wav)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(3L) == fp(19L) && fp(19L) == fp(35L),
      "amplitude changed the fingerprint")
    val ham = java.lang.Long.bitCount(fp(0L) ^ fp(16L))
    assert(ham >= 0 && ham <= 2, s"perturbation moved $ham bits")
  }
}
