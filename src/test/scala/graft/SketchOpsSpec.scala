package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Round-5 sketch/quantization operators: HyperLogLog distinct,
  * Jaccard-containment dedup, int8 embedding quantization. The DuckDB
  * oracles (d16/d17/s08) pin cross-engine value equality; these specs
  * pin the SEMANTIC claims the oracles can't express — error bounds,
  * repeat-insensitivity, planted-structure detection.
  */
class SketchOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("HLL estimate lands within the m=256 error envelope") {
    // 600 distinct texts; standard error ~1.04/sqrt(256) = 6.5%, so a
    // 25% corridor is ~4 sigma — deterministic here anyway (fixed hash)
    val docs = docsDf((0 until 600).map(i => s"document number $i payload"))
    val row = Dedup.hllDistinct(docs, p = 8).collect().head
    val (nExact, est) = (row.getAs[Long]("n_exact"), row.getAs[Double]("estimate"))
    assert(nExact == 600L)
    assert(math.abs(est - 600.0) / 600.0 < 0.25, s"estimate $est vs 600")
  }

  test("HLL is repeat-insensitive: duplicating the corpus changes nothing") {
    val texts = (0 until 300).map(i => s"doc $i body words here")
    val once = Dedup.hllDistinct(docsDf(texts), p = 8)
      .select("n_buckets_used", "denom", "estimate").collect().head
    val thrice = Dedup.hllDistinct(docsDf(texts ++ texts ++ texts), p = 8)
      .select("n_buckets_used", "denom", "estimate").collect().head
    assert(once == thrice, "register state must depend on the SET of texts")
  }

  test("HLL sliced registers merge to exactly the direct estimate") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val row = Dedup.hllSliceMerge(events, p = 8).collect().head
    assert(row.getAs[Boolean]("merge_exact"),
      "per-slice MAX-merged registers must equal the one-pass registers")
    assert(row.getAs[Long]("n_slices") > 1, "fixture must actually slice")
    // no accuracy corridor here: the fixture's handful of distinct users
    // sits in the raw estimator's known small-range bias zone (the
    // regime the omitted-for-portability linear-counting correction
    // serves); d16's 600-distinct spec covers accuracy
    assert(row.getAs[Double]("merged_estimate") > 0.0)
  }

  test("containment flags a planted near-superset pair at 1.0") {
    val words = (1 to 30).map(i => s"w$i")
    val base = words.mkString(" ")
    val prefix = words.dropRight(3).mkString(" ") // shingles(prefix) subset of shingles(base)
    val filler = Seq(
      "completely unrelated content one two three four five",
      "another separate document with different words entirely")
    val docs = docsDf(Seq(base, prefix) ++ filler)
    val pairs = Dedup.containmentDup(docs, threshold = 0.7).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(pairs.contains((0L, 1L)), s"planted pair missing: $pairs")
    assert(pairs((0L, 1L)) == 1.0, "prefix shingles all contained => 1.0")
    // same pair under plain Jaccard scores strictly lower (sizes differ)
    val jac = Dedup.minhashDup(docs, threshold = 0.1).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(jac((0L, 1L)) < 1.0 && jac((0L, 1L)) >= 0.8)
  }

  test("asymmetric containment finds a small doc inside a 13x larger one") {
    val big = (1 to 200).map(i => s"t$i").mkString(" ")
    val small = (50 to 64).map(i => s"t$i").mkString(" ") // 15-word slice
    val docs = docsDf(Seq(big, small,
      "one unrelated document with its own words",
      "another unrelated document full of other words"))
    val asym = Dedup.containmentDupAsym(docs, threshold = 0.8).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(asym.contains((1L, 0L)), s"directed pair missing: $asym")
    assert(asym((1L, 0L)) == 1.0, "every slice shingle is in the host")
    // the symmetric minhash-band path CANNOT see this pair — its
    // Jaccard is ~13/198, far below any banding collision — which is
    // exactly the gap the asymmetric probe exists to close
    val sym = Dedup.containmentDup(docs, threshold = 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!sym.contains((0L, 1L)) && !sym.contains((1L, 0L)))
  }

  test("incremental asym containment: fresh batch probed against the corpus") {
    val big = (1 to 200).map(i => s"t$i").mkString(" ")
    val corpus = docsDf(Seq(big,
      "one unrelated corpus document with its own words"))
    val fresh = Seq(
      (10L, (50 to 64).map(i => s"t$i").mkString(" ")), // slice of corpus 0
      (11L, "a completely novel incoming document"))
      .toDF("doc_id", "text")
    val hits = Dedup.containmentDupAsymAgainst(corpus, fresh, threshold = 0.8)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    // only the directed new-in-corpus pair; the corpus never self-pairs
    assert(hits.keySet == Set((10L, 0L)), s"got $hits")
    assert(hits((10L, 0L)) == 1.0)
  }

  test("LSH/IVF plane and centroid selection works on arbitrary vec_ids") {
    import spark.implicits._
    // ids far above any plane/centroid count: the old `vec_id < n`
    // selection would find nothing here
    val embs = Seq(
      (5000L, Array(1f, 0f, 0f, 0f)), (6000L, Array(0f, 1f, 0f, 0f)),
      (7000L, Array(0.9f, -0.1f, 0f, 0f)), (8000L, Array(0f, 0f, 1f, 1f)),
      (9999L, Array(0f, 1f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val buckets = graft.ext.Similarity.lshBuckets(embs, nPlanes = 2).collect()
    assert(buckets.length == 5)
    // queries = ids < 7000 convention-free: use the Against-form dedup
    // which takes explicit sides
    val pairs = graft.ext.Similarity.lshCosineDupAgainst(
        embs.filter(col("vec_id") < 7000), embs.filter(col("vec_id") >= 7000),
        nPlanes = 2, threshold = 0.9).collect()
    assert(pairs.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      == Set((7000L, 5000L), (9999L, 6000L)))
  }

  test("semDedup: planted near-identical pair found, centroid-nearest dropped") {
    import spark.implicits._
    // two tight groups far apart; ids arbitrary (non-contiguous).
    // 7001 is 5001 plus a tiny perturbation -> same cluster, cosine ~1;
    // the lone 9000 direction produces no pair.
    val embs = Seq(
      (5001L, Array(10f, 0f, 0f, 0f)), (7001L, Array(10f, 0.01f, 0f, 0f)),
      (6002L, Array(0f, 10f, 0f, 0f)), (8002L, Array(0f, 10f, 0.01f, 0f)),
      (9000L, Array(0f, 0f, 0f, 10f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semDedup(embs, k = 3, iters = 2, threshold = 0.99)
      .collect()
    val pairs = out.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((5001L, 7001L), (6002L, 8002L)))
    // the dropped member is the one NEARER its centroid (keep the
    // outlier, per SemDeDup); both members are in the pair, so the
    // drop_id must be one of them
    out.foreach { r =>
      val (a, b, drop) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Long]("drop_id"))
      assert(drop == a || drop == b)
    }
  }

  test("semDedup: maxCluster cap drops a pathological cluster, keeps the rest") {
    import spark.implicits._
    // 30 identical vectors in one direction (one huge cluster) plus a
    // small legit dup pair in another; cap 10 removes the hot cluster's
    // n^2 while the small cluster still reports its pair. Cold ids
    // 26/27 chosen so the k=2 hash-order-statistic seeding picks one
    // hot and one cold seed (h32("27") is 2nd-smallest over these ids).
    val hot = (0 until 30).map(i => (1000L + i, Array(10f, 0f, 0f, 0f)))
    val cold = Seq((26L, Array(0f, 10f, 0f, 0f)), (27L, Array(0f, 10f, 0.01f, 0f)))
    val embs = (hot ++ cold).toDF("vec_id", "embedding")
    val capped = Similarity.semDedup(embs, k = 2, iters = 2,
      threshold = 0.99, maxCluster = 10).collect()
    val pairs = capped.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs == Set((26L, 27L)),
      s"hot cluster must be quarantined, got ${pairs.size} pairs")
  }

  test("clusterSample keeps the most-central members per cluster") {
    import spark.implicits._
    // two tight directions; the slightly-perturbed member of each pair
    // is farther from the cluster mean, so perCluster=1 keeps the
    // member nearer the fixed-point centroid
    val embs = Seq(
      (5001L, Array(10f, 0f, 0f, 0f)), (7001L, Array(10f, 2f, 0f, 0f)),
      (6002L, Array(0f, 10f, 0f, 0f)), (8002L, Array(0f, 10f, 2f, 0f)))
      .toDF("vec_id", "embedding")
    val all = Similarity.clusterSample(embs, k = 2, iters = 2, perCluster = 10)
      .collect()
    assert(all.length == 4) // perCluster above size: everything sampled
    assert(all.forall(_.getAs[Int]("rk") <= 2))
    val one = Similarity.clusterSample(embs, k = 2, iters = 2, perCluster = 1)
      .collect()
    assert(one.length == 2 && one.forall(_.getAs[Int]("rk") == 1))
    // each kept member is its cluster's min-dist2 row from the full run
    val bestPerCluster = all.groupBy(_.getAs[Long]("cluster"))
      .map { case (c, rs) => c -> rs.minBy(r =>
        (r.getAs[Double]("dist2"), r.getAs[Long]("vec_id"))).getAs[Long]("vec_id") }
    one.foreach { r =>
      assert(bestPerCluster(r.getAs[Long]("cluster")) == r.getAs[Long]("vec_id"))
    }
  }

  test("nearDupResolution keeps exactly one highest-quality doc per cluster") {
    // three near-identical docs (one cluster) with different quality
    // (distinct-word ratio); two unrelated docs form no cluster
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = docsDf(Seq(
      base,
      base + " extra", // superset shingles -> jaccard above 0.5
      base + " extra words variety increases distinct ratio quality substantially",
      "completely different text about spark physical plans and shuffles",
      "another unrelated document mentioning parquet column pruning"))
    val out = Dedup.nearDupResolution(
      docs.withColumn("n_chars", length(col("text"))), threshold = 0.5).collect()
    // only clustered docs appear
    assert(out.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(0L, 1L, 2L)))
    val kept = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id"))
    assert(kept.length == 1, s"one winner per cluster, got ${kept.mkString(",")}")
    // the winner has the max quality among its cluster's members
    val best = out.maxBy(_.getAs[Double]("quality")).getAs[Long]("doc_id")
    assert(kept.head == best)
  }

  test("k-means: inertia never increases across Lloyd iterations") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def inertia(iters: Int): Double =
      Similarity.kmeansFit(embs, k = 8, iters = iters)
        .agg(sum(col("dist2"))).collect().head.getDouble(0)
    val i0 = inertia(0) // assignment under the raw init centroids
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i1 <= i0 && i2 <= i1, s"inertia must be monotone: $i0, $i1, $i2")
    assert(i2 < i0, "two Lloyd rounds must actually improve the init")
  }

  test("k-means assigns every vector to an existing cluster, exhaustively") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.kmeansFit(embs, k = 8, iters = 2)
    assert(out.count() == embs.count())
    // cluster ids are the SEED vec_ids (hash order-statistic), so they
    // are some subset of the corpus ids of size <= k
    val ids = embs.select("vec_id").collect().map(_.getLong(0)).toSet
    val clusters = out.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf(ids) && clusters.nonEmpty && clusters.size <= 8)
    assert(out.filter(col("dist2") < 0).isEmpty)
  }

  test("k-means seeds by hash order-statistic: arbitrary vec_ids train fine") {
    // non-contiguous, non-zero-based ids — the corpora real pipelines
    // have; the old `vec_id < k` init would find no seeds here
    val embs = Seq(
      (1000L, Array(0f, 0f), 0), (2500L, Array(10f, 10f), 0),
      (7777L, Array(0.1f, 0f), 0), (123456789L, Array(10f, 10.2f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansFit(embs, k = 2, iters = 2).collect()
    assert(out.length == 4)
    val ids = Set(1000L, 2500L, 7777L, 123456789L)
    assert(out.map(_.getAs[Long]("cluster")).toSet.subsetOf(ids))
    assert(out.forall(_.getAs[Double]("dist2") >= 0.0))
  }

  test("bounded-sample training still assigns the full corpus") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // trainCap far below the corpus size forces the hash-sample path
    // (modulus > 1); Lloyd trains on the sample, the final assignment
    // still covers every vector
    val out = Similarity.kmeansFit(embs, k = 8, iters = 2, trainCap = 100)
    assert(out.count() == embs.count())
    val ids = embs.select("vec_id").collect().map(_.getLong(0)).toSet
    val clusters = out.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf(ids) && clusters.nonEmpty)
  }

  test("fixed-point centroid sum overflow fails loudly") {
    // max|x| * n over the 2^22 envelope: summing floor(x*2^40) longs
    // could overflow, so the trainer must refuse rather than converge
    // to corrupt centroids
    val big = Seq(
      (0L, Array(5e6f, 0f), 0), (1L, Array(5e6f, 1f), 0),
      (2L, Array(-5e6f, 2f), 0), (3L, Array(5e6f, 3f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansFit(big, k = 2, iters = 1).collect()
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("PQ with one subspace degenerates to plain k-means") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pq = Similarity.pqEncode(embs, nSub = 1, k = 8, iters = 1).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[String]("code"), r.getAs[Double]("recon_err"))).toSeq
    val km = Similarity.kmeansFit(embs, k = 8, iters = 1).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("cluster").toString, r.getAs[Double]("dist2"))).toSeq
    assert(pq == km)
  }

  test("PQ subspace codebooks beat one full-space codebook of equal k") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def total(df: org.apache.spark.sql.DataFrame, c: String): Double =
      df.agg(sum(col(c))).collect().head.getDouble(0)
    // 4 x 16-centroid subspaces quantize 16^4 effective codewords; the
    // fixture pins the expected large win over a single 16-centroid
    // codebook (not a theorem — an empirical regression guard)
    val pqErr = total(Similarity.pqEncode(embs, nSub = 4, k = 16, iters = 1), "recon_err")
    val kmErr = total(Similarity.kmeansFit(embs, k = 16, iters = 1), "dist2")
    assert(pqErr < kmErr, s"pq $pqErr vs kmeans $kmErr")
  }

  test("PQ ADC search beats chance recall by an order of magnitude") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val nQ = 10; val topK = 5
    val adc = Similarity.pqAdcTopK(embs, nSub = 4, k = 16, iters = 1,
        nQueries = nQ, topK = topK).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(adc.size == nQ && adc.values.forall(_.size == topK))
    // exact L2 top-5 reference, computed brute-force in the spec
    val v = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = v.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val t = v.filter(col("vec_id") >= nQ)
      .select(col("vec_id").as("t_id"), col("v").as("tv"))
    val d2 = aggregate(zip_with(col("qv"), col("tv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("t_id"))
    val exact = q.crossJoin(t).select(col("q_id"), col("t_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (qq, rs) => qq -> rs.map(_.getAs[Long]("t_id")).toSet }
    val recall = adc.map { case (qq, s) =>
      (s intersect exact(qq)).size.toDouble / topK }.sum / nQ
    // the fixture's embeddings are near-isotropic — PQ's worst case, so
    // absolute recall is modest by construction. Chance recall@5 over
    // 490 targets is ~0.01; the codes recall 0.08 here (deterministic:
    // fixed fixture, fixed hash-seeded init — the earlier 0.26 under
    // zero-based init was inflated by taking the query vectors
    // themselves as seeds), pinned with margin as a regression guard.
    // Structured corpora are where 4x16 codes shine; the ORACLE, not
    // this spec, is the exactness statement.
    assert(recall >= 0.05, s"ADC recall@5 $recall")
  }

  test("k-means and PQ fail loudly on degenerate inputs") {
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(empty, nSub = 2, k = 4, iters = 1)
    }
    intercept[IllegalArgumentException] {
      // empty corpus: an empty init centroid set would assign nulls
      Similarity.kmeansFit(
        Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label"),
        k = 4, iters = 1).collect()
    }
    intercept[IllegalArgumentException] {
      // dims not divisible by the subspace count
      Similarity.pqEncode(
        Seq((0L, Array(1.0f, 2.0f, 3.0f), 0)).toDF("vec_id", "embedding", "label"),
        nSub = 2, k = 1, iters = 0)
    }
  }

  test("residual IVF-PQ matches-or-beats the non-residual recall") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val nQ = 10; val topK = 5
    val ivf = Similarity.ivfPqTopK(embs, nCells = 8, nProbe = 2,
        nSub = 4, k = 16, iters = 1, nQueries = nQ, topK = topK).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(_.getAs[Double]("adc_dist") >= 0.0))
    // recall@5 vs the exact L2 top-5: PQ over raw (non-residual) codes
    // measured 0.10 on this fixture at identical parameters — encoding
    // v - coarse_centroid(cell) (IVFADC) must not do worse at the same
    // code budget. Deterministic: fixed fixture, fixed hash-seeded init.
    val byQ = ivf.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val v = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = v.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val t = v.filter(col("vec_id") >= nQ)
      .select(col("vec_id").as("t_id"), col("v").as("tv"))
    val d2 = aggregate(zip_with(col("qv"), col("tv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("t_id"))
    val exact = q.crossJoin(t).select(col("q_id"), col("t_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (qq, rs) => qq -> rs.map(_.getAs[Long]("t_id")).toSet }
    val recall = byQ.map { case (qq, s) =>
      (s intersect exact.getOrElse(qq, Set.empty)).size.toDouble / topK }
      .sum / nQ
    assert(recall >= 0.10, s"residual IVF-PQ recall@5 $recall")
  }

  test("quantile sketch: bounded sample estimates, KMV merge identity") {
    import java.sql.Timestamp
    // one hour of 1000 events with value == event_id: true median 499.5,
    // true p90 899.1 — the k=32 sample must land in the right region
    // and the parity-merged sketch must select EXACTLY the same rows
    val events = (0L until 1000L).map { i =>
      (i, new Timestamp(3600L * 1000 + i), i.toDouble)
    }.toDF("event_id", "ts", "value")
    val out = graft.ext.Dedup.quantileSketchMerge(events, k = 32).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("m") == 32, "sample must cap at k")
    assert(r.getAs[Boolean]("merge_exact"), "KMV merge identity must hold")
    val p50 = r.getAs[Double]("p50_est"); val p90 = r.getAs[Double]("p90_est")
    // a uniform 32-sample's rank statistics: generous deterministic
    // corridors (fixed hash → fixed sample) around the true quantiles
    assert(p50 > 200 && p50 < 800, s"p50_est $p50")
    assert(p90 > 700 && p90 <= 999, s"p90_est $p90")
    assert(p50 < p90)
  }

  test("BM25 ranks rare-term matches above common-term matches") {
    // doc 0 is the query: one rare term ("zebra") + one everywhere-term
    // ("common"). The corpus doc holding the rare term must outrank the
    // docs that only share the stopword-like term, and saturation (k1)
    // must keep a term-spamming doc from swamping the rare-term signal.
    val docs = docsDf(Seq(
      "zebra common",                                   // 0: the query
      "zebra herd grazing quietly common",              // 1: rare-term match
      "common words only in this one common common",    // 2: common-only
      "common phrasing common again common common common", // 3: common spam
      "totally unrelated content here",                 // 4: no overlap
      "more filler common text"))                       // 5: common-only
    val top = graft.ext.TextAnalysis.bm25TopK(docs, nQueries = 1, topK = 5)
      .collect()
    val ranked = top.map(r =>
      (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rn")))
    assert(ranked.head == ((1L, 1)), s"rare-term doc must rank first: ${ranked.toSeq}")
    // doc 4 shares no term: absent from the result entirely
    assert(!top.exists(_.getAs[Long]("neighbor_id") == 4L))
    assert(top.forall(_.getAs[Double]("score") > 0.0))
  }

  test("LM-quality score ranks common-construction text above gibberish") {
    val common = "the cat sat on the mat"
    val docs = docsDf(Seq(
      common, common, common, // three docs of the same common bigrams
      "zxq wvut plok mnbju qsdfg hjklz", // unique-bigram gibberish
      "the cat sat quietly watching birds"))
    val scores = graft.ext.TextAnalysis.lmQualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_freq")).toMap
    assert(scores(0L) > scores(3L),
      s"common ${scores(0L)} must beat gibberish ${scores(3L)}")
    assert(scores(4L) > scores(3L),
      "sharing SOME common bigrams still beats all-unique")
    // docs with < 2 words have no bigrams and no row
    val one = graft.ext.TextAnalysis.lmQualityScore(docsDf(Seq("word", "a b")))
    assert(one.count() == 1)
  }

  test("odds classifier separates curated prose from crawl spam") {
    val docs = Seq(
      (1L, "clean clear prose about science", "wiki"),
      (2L, "careful clear writing about history", "wiki"),
      (3L, "buy now spam spam click here", "crawl"),
      (4L, "spam click buy cheap now", "crawl"),
      // unlabeled docs scored by the trained weights only
      (5L, "clear prose about careful science", "web"),
      (6L, "click spam buy", "web"),
      (7L, "", "web")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.oddsQualityClassifier(docs,
      posSources = Seq("wiki"), negSources = Seq("crawl"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.size == 7)
    assert(out(1L)._2 && out(2L)._2 && out(5L)._2, "curated-looking kept")
    assert(!out(3L)._2 && !out(4L)._2 && !out(6L)._2, "spam-looking dropped")
    assert(out(7L)._1 == 0L && !out(7L)._2, "no-vocab doc scores 0, dropped")
    // class-balanced by construction: a token appearing only in the
    // positive class scores positive, and vice versa
    assert(out(5L)._1 > 0L && out(6L)._1 < 0L)
  }

  test("odds classifier refuses bad class setups") {
    val docs = Seq((1L, "a b", "wiki")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      TextAnalysis.oddsQualityClassifier(docs, Seq("wiki"), Seq("wiki"))
    }
    // negative class present in the source list but empty in the data
    intercept[IllegalArgumentException] {
      TextAnalysis.oddsQualityClassifier(docs, Seq("wiki"), Seq("crawl"))
    }
  }

  test("int8 quantization: exact codes, error bound, zero-vector guard") {
    val embs = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.quantizeInt8(embs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"), r.getAs[String]("q_md5"),
          r.getAs[Double]("sq_err")))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val (scale0, md50, err0) = rows(0L)
    // x/scale: 1.0->127, -0.5->-63.5 (floor(+0.5) -> -63), 0.25->31.75
    // (-> 32), 0 -> 0
    assert(scale0 == 1.0 / 127.0)
    assert(md50 == md5hex("127,-63,32,0"))
    // reconstruction error per dim is at most (scale/2 + ulp)^2
    assert(err0 <= 4 * math.pow(scale0 / 2 * 1.0000001, 2), s"err $err0")
    assert(err0 > 0.0) // -63.5 rounds away from exact: strictly lossy
    val (scale1, md51, err1) = rows(1L)
    assert(scale1 == 0.0 && err1 == 0.0 && md51 == md5hex("0,0,0,0"))
  }
}
