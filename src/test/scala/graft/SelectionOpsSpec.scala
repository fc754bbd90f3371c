package graft

import org.apache.spark.sql.functions._

import graft.ext.{Curation, Dedup, Similarity}

/** Property checks for the retrieval-selection and curation-planning
  * operators (oracle twins prove cross-engine exactness; these pin the
  * semantics on hand-built inputs).
  */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("filteredBruteTopK returns only allowed targets, a subset of unfiltered") {
    val embs = Seq(
      (0L, vec(1f, 0f)), // query
      (10L, vec(1f, 0.01f)), (11L, vec(1f, 0.02f)), (12L, vec(0f, 1f)))
      .toDF("vec_id", "embedding")
    val allowed = Seq(11L, 12L).toDF("vec_id")
    val got = Similarity.filteredBruteTopK(embs, allowed, nQueries = 1, k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(11L, 12L))
    val unfiltered = Similarity.bruteForceTopK(embs, nQueries = 1, k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got.subsetOf(unfiltered))
  }

  test("signHammingTopK: exact bit distances across both 32-bit words") {
    def v64(f: Int => Float): Array[Float] = Array.tabulate(64)(f)
    val embs = Seq(
      (0L, v64(_ => 1f)),                          // query: all bits set
      (10L, v64(_ => 1f)),                         // identical -> ham 0
      (11L, v64(i => if (i < 32) -1f else 1f)),    // low word flipped -> 32
      (12L, v64(i => if (i == 40) -1f else 1f)))   // one high-word bit -> 1
      .toDF("vec_id", "embedding")
    val got = Similarity.signHammingTopK(embs, nQueries = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq((10L, 0L, 1), (12L, 1L, 2), (11L, 32L, 3)))
  }

  test("signHammingRerank: surviving candidates score exactly as brute force") {
    val embs = graft.core.Tables.load(spark,
      "/root/testdata/sf0.001", "embeddings")
    val rerank = Similarity.signHammingRerank(embs, nQueries = 4,
      kShort = 20, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rerank.nonEmpty)
    val brute = Similarity.bruteForceTopK(embs, nQueries = 4, k = 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rerank.foreach { case (pair, cos) =>
      assert(brute(pair) == cos, s"cosine mismatch for $pair")
    }
  }

  test("hardNegatives skips the nearest same-label hit, keeps cross-label ranks") {
    // target 10 is the query's nearest neighbor but shares its label —
    // mining must skip it and rank only the different-label targets
    val embs = Seq(
      (0L, vec(1f, 0f), 7), // query, label 7
      (10L, vec(1f, 0.001f), 7), // nearest overall, SAME label
      (11L, vec(1f, 0.1f), 3), // best hard negative
      (12L, vec(0.5f, 0.8f), 4), // weaker negative
      (13L, vec(0f, 1f), 7)) // same label again
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(embs, nQueries = 1, k = 3).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(11L, 12L)) // 10 and 13 excluded
    assert(got.map(_.getInt(3)).toSeq == Seq(3, 4)) // neighbor_label re-attached
    assert(got.forall(r => r.getInt(1) == 7 && r.getInt(3) != 7))
    assert(got.map(_.getInt(5)).toSeq == Seq(1, 2)) // dense ranks, no gap for 10
  }

  test("mmrTopK's second pick trades relevance for diversity") {
    // two near-identical top hits plus a slightly less relevant but
    // diverse one: plain top-2 takes the twins; MMR's second pick must
    // be the diverse target
    val embs = Seq(
      (0L, vec(1f, 0f, 0f)), // query
      (10L, vec(0.99f, 0.1f, 0f)), // top hit
      (11L, vec(0.98f, 0.11f, 0f)), // its near-twin
      (12L, vec(0.7f, 0f, 0.7f))) // diverse, lower relevance
      .toDF("vec_id", "embedding")
    val mmr = Similarity.mmrTopK(embs, nQueries = 1, kCand = 3, kSel = 2)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(mmr(1) == 10L)
    assert(mmr(2) == 12L, s"expected the diverse pick, got ${mmr(2)}")
    val plain = Similarity.bruteForceTopK(embs, nQueries = 1, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(plain == Set(10L, 11L))
  }

  test("temperatureMixture damps the head: tail share rises, quotas fit budget") {
    val docs = ((1 to 900).map(i => (i.toLong, "x", "en")) ++
      (1 to 100).map(i => (900L + i, "x", "fr")))
      .toDF("doc_id", "text", "lang")
    val q = Curation.temperatureMixture(docs, "lang", budgetDocs = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(q.values.sum <= 100L)
    // proportional would give fr 10%; sqrt damping must give more
    assert(q("fr") > 10L, s"tail quota not damped up: $q")
    assert(q("en") < 90L)
  }

  test("shard plan: every shard within budget + one doc, docs contiguous") {
    // mirrors c13's rule on a hand corpus: shard_id = prefix DIV 100
    val docs = (1L to 50L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n_chars")
    val planned = graft.operators.PrefixSum
      .withRunningSum(docs, Seq(col("doc_id")), "n_chars", "start")
      .withColumn("shard_id", expr("start div 100"))
    val shards = planned.groupBy(col("shard_id"))
      .agg(sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    val maxDoc = 16L
    shards.foreach { r =>
      assert(r.getLong(1) <= 100L + maxDoc, s"oversized shard: $r")
      // contiguity: id range length == doc count
      assert(r.getLong(3) - r.getLong(2) + 1 == r.getLong(4), s"gap in $r")
    }
  }

  test("hllIntersection estimate tracks a planted overlap") {
    val events = ((1 to 600).map(u => (u.toLong, "view")) ++
      (301 to 900).map(u => (u.toLong, "purchase")))
      .map { case (u, t) => (u, t, u) }
      .toDF("user_id", "event_type", "event_id")
    val row = Dedup.hllIntersection(events, "view", "purchase", p = 8)
      .collect()(0)
    val est = row.getDouble(3); val exact = row.getLong(4)
    assert(exact == 300L)
    // p=8 HLL: ~6.5% relative error per sketch; inclusion-exclusion
    // compounds it — assert the estimate is in a generous envelope
    assert(est > 150.0 && est < 450.0, s"estimate $est far from $exact")
  }

  test("persisted IVF index: same results as live, zero-Exchange corpus probe") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // a previous JVM's interrupted run can leave the managed location
    // behind without a catalog entry — clear both before the build
    spark.sql("DROP TABLE IF EXISTS ivf_idx_spec")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/ivf_idx_spec")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    Similarity.persistIvfIndex(embs, nCentroids = 16, nQueries = 10,
      table = "ivf_idx_spec", buckets = 8)
    val live = Similarity.ivfTopK(embs, 16, 2, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val fromIdx = Similarity.ivfTopKFromIndex(spark, "ivf_idx_spec",
        embs, 16, 2, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(fromIdx == live)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.ivfTopKFromIndex(spark, "ivf_idx_spec",
        embs, 16, 2, 10, 5).queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"index not read as a bucketed scan:\n$plan")
      // query-side only, EXACTLY: the probe-selection window, the cell
      // join's probe shuffle, and the final per-query window — the
      // corpus/index side contributes none at any index size
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 3, s"expected exactly 3 query-side exchanges:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("appended IVF index: frozen-centroid append equals a full rebuild") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.sql("DROP TABLE IF EXISTS ivf_idx_append_spec")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/ivf_idx_append_spec")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    val original = embs.filter(col("vec_id") < 300)
    Similarity.persistIvfIndex(original, nCentroids = 16, nQueries = 10,
      table = "ivf_idx_append_spec", buckets = 8)
    Similarity.appendIvfIndex(spark, "ivf_idx_append_spec", original,
      embs.filter(col("vec_id") >= 300), nCentroids = 16, nQueries = 10)
    // the centroid seeds (lowest 16 target ids) all sit below the
    // split, so the frozen-centroid append must serve BIT-IDENTICAL
    // results to the live build over the full corpus
    val live = Similarity.ivfTopK(embs, 16, 2, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val fromIdx = Similarity.ivfTopKFromIndex(spark, "ivf_idx_append_spec",
        embs, 16, 2, 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(fromIdx == live)
    // the appended files must land under the table's bucket spec: the
    // probe still reads a bucketed scan with query-side-only exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.ivfTopKFromIndex(spark, "ivf_idx_append_spec",
        embs, 16, 2, 10, 5).queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"index not read as a bucketed scan:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 3, s"expected exactly 3 query-side exchanges:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("persisted IVF-PQ index: bit-identical to live, exchange-free corpus probe") {
    import spark.implicits._
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val cbPath = wh + "/ivf_pq_cb_spec"
    spark.sql("DROP TABLE IF EXISTS ivf_pq_idx_spec")
    for (p <- Seq(wh + "/ivf_pq_idx_spec", cbPath)) {
      val loc = new org.apache.hadoop.fs.Path(p)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Similarity.persistIvfPqIndex(embs, nCells = 8, nSub = 4, k = 16,
      iters = 1, nQueries = 10, table = "ivf_pq_idx_spec", buckets = 8,
      codebookPath = cbPath)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq
    val live = rows(Similarity.ivfPqTopK(embs, nCells = 8, nProbe = 2,
      nSub = 4, k = 16, iters = 1, nQueries = 10, topK = 5))
    val fromIdx = rows(Similarity.ivfPqTopKFromIndex(spark,
      "ivf_pq_idx_spec", cbPath, embs, nProbe = 2, nQueries = 10, topK = 5))
    // bit-identical including the ADC double — persistence moves no values
    assert(fromIdx == live)

    // the per-batch/per-query probe shape: (q_id, cell) against the
    // cell-bucketed code rows — corpus side must plan exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Seq((0L, 0L)).toDF("q_id", "cell")
        .join(spark.table("ivf_pq_idx_spec"), "cell")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"code rows not read as a bucketed scan:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the probe-side shuffle:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("dedup families disagree where they should: edit-close vs set-close") {
    // docs 0/2: one in-place character edit (edit-distance close, and
    // shingle sets nearly identical); docs 0/4: same words shuffled
    // (n-gram/minhash see overlap, edit distance sees a rewrite)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (0L, base, "en", base.length.toLong),
      (2L, base.replace("charlie", "charlee"), "en", base.length.toLong),
      (4L, base.split(" ").reverse.mkString(" "), "en", base.length.toLong))
      .toDF("doc_id", "text", "lang", "n_chars")
    val edit = Dedup.editDistanceDup(docs, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edit.contains((0L, 2L)))
    assert(!edit.contains((0L, 4L)), s"reversal should not be edit-close: $edit")
    val ng = Dedup.ngramJaccardDup(docs, n = 4, maxLenDiff = 10,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng.contains((0L, 2L)) || ng.contains((0L, 4L)))
  }

  test("dbscanLite: dense blob is core, fringe is border, sparse blob is noise") {
    // blob A (ids 0-3): pairwise cosine >= 0.9 -> each deg 3 -> core at
    // minPts=3. id 4 sees only a subset of A (deg 2) -> border, joins
    // A's cluster. id 5 orthogonal -> noise. blob B (6-8): pairwise
    // close but only deg 2 each — BELOW the density bar, so the whole
    // blob is noise (the defining DBSCAN behavior vs plain CC)
    val embs = Seq(
      (0L, vec(1f, 0f, 0f)), (1L, vec(0.99f, 0.141f, 0f)),
      (2L, vec(0.99f, -0.141f, 0f)), (3L, vec(0.97f, 0f, 0.243f)),
      (4L, vec(0.92f, -0.392f, 0f)), (5L, vec(0f, 0f, 1f)),
      (6L, vec(0f, 1f, 0f)), (7L, vec(0.141f, 0.99f, 0f)),
      (8L, vec(-0.141f, 0.99f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscanLite(embs, threshold = 0.9, minPts = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (0L to 3L).foreach(i => assert(got(i) == ("core", 0L), s"$i: ${got(i)}"))
    assert(got(4L) == ("border", 0L))
    assert(got(5L) == ("noise", -1L))
    (6L to 8L).foreach(i => assert(got(i) == ("noise", -1L), s"$i: ${got(i)}"))
  }

  test("k-center coreset: farthest-point picks, tie-break, cover radii") {
    import spark.implicits._
    val embs = Seq(
      (1L, vec(0f, 0f)), (2L, vec(1f, 0f)),
      (3L, vec(10f, 0f)), (4L, vec(0f, 10f)))
      .toDF("vec_id", "embedding")
    val got = graft.ext.Similarity.kcenterCoreset(embs, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // seed 1; then 3 and 4 tie at d2=100 (lower id first); last 2 at 1
    assert(got.toSeq == Seq((1, 1L, None), (2, 3L, Some(100.0)),
      (3, 4L, Some(100.0)), (4, 2L, Some(1.0))))
  }

  test("rrf fusion: scores are the exact integer rank identity over both rankers") {
    import spark.implicits._
    // id space is shared: vec_id i embeds doc_id i. Candidate 2 is
    // rank 2 dense + rank 1 sparse; candidate 1 is rank 1 dense only
    // -> 2 must outrank 1 (floor(Q/62)+floor(Q/61) > floor(Q/61)).
    val embs = Seq(
      (0L, vec(1f, 0f)),                       // query
      (1L, vec(1f, 0.01f)), (2L, vec(0.9f, 0.1f)), (3L, vec(0f, 1f)))
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "alpha beta"),                      // query doc
      (1L, "gamma delta gamma"),               // no term overlap
      (2L, "alpha alpha delta"), (3L, "beta epsilon zeta"))
      .toDF("doc_id", "text")
    val fused = graft.ext.Similarity.hybridRrfTopK(docs, embs,
      nQueries = 1, depth = 3, k = 4).collect()
    val q = 1099511627776.0
    def c(rn: Int): Long = math.floor(q / (60.0 + rn)).toLong
    val dense = graft.ext.Similarity.bruteForceTopK(embs, 1, 3).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    val sparse = graft.ext.TextAnalysis.bm25TopK(docs, 1, 3).collect()
      .map(r => r.getLong(1) -> r.getInt(3)).toMap
    fused.foreach { r =>
      val id = r.getLong(1)
      val want = dense.get(id).map(c).getOrElse(0L) +
        sparse.get(id).map(c).getOrElse(0L)
      assert(r.getLong(2) == want, s"candidate $id")
    }
    assert(fused.head.getLong(1) == 2L) // in both lists -> fused top-1
    assert(fused.map(_.getLong(1)).contains(1L)) // dense-only still present
  }

  test("nsw beam search walks an angular chain to the true neighbor") {
    // targets 10..29 on an arc (4° apart); edges (g=4) connect angular
    // neighbors (±2 hops), entries are the low-angle end, the query sits at the
    // FAR end — greedy navigation must traverse the whole chain
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val targets = (10 to 29).map(i => (i.toLong, at((i - 10) * 4.0)))
    val embs = ((0L, at(76.0)) +: targets).toDF("vec_id", "embedding")
    val got = Similarity.nswSearch(embs, nQueries = 1, g = 4, beam = 2,
      rounds = 12, k = 3).collect()
    assert(got.head.getLong(1) == 29L, s"top-1 ${got.head}") // true NN
    assert(got.head.getBoolean(4), "top-1 must be flagged in_exact")
    // and the whole top-3 is the exact top-3 (29, 28, 27)
    assert(got.map(_.getLong(1)).toSeq == Seq(29L, 28L, 27L))
    assert(got.forall(_.getBoolean(4)))
  }

  test("nsw LSH build equals the exact build when bands collapse to one bucket") {
    // same angular chain as above: every target and every plane sit
    // within 90 degrees of each other, so all sign bits are 1 -> one
    // bucket -> band candidates = all pairs -> the LSH-built graph IS
    // the exact 4-NN graph, and the two searches must match row-for-row
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val targets = (10 to 29).map(i => (i.toLong, at((i - 10) * 4.0)))
    val embs = ((0L, at(76.0)) +: targets).toDF("vec_id", "embedding")
    val exact = Similarity.nswSearch(embs, nQueries = 1, g = 4, beam = 2,
      rounds = 12, k = 3).collect().toSeq
    val viaLsh = Similarity.nswSearchLsh(embs, nQueries = 1, nPlanes = 8,
      bandBits = 4, g = 4, beam = 2, rounds = 12, k = 3).collect().toSeq
    assert(viaLsh == exact)
    assert(viaLsh.map(_.getLong(1)).toSeq == Seq(29L, 28L, 27L))
  }

  test("nsw LSH build: empty corpus degrades to empty, multi-band pair scores once") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.nswSearchLsh(empty, nQueries = 1).count() == 0)
    // two identical targets collide in BOTH bands; the distinct-before-
    // cosine contract means each appears exactly once per query rank
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val embs = Seq((0L, at(10.0)), (10L, at(11.0)), (11L, at(11.0)),
      (12L, at(40.0))).toDF("vec_id", "embedding")
    val got = Similarity.nswSearchLsh(embs, nQueries = 1, nPlanes = 8,
      bandBits = 4, g = 2, beam = 2, rounds = 2, k = 3).collect()
    val perRank = got.map(r => (r.getLong(0), r.getInt(3)))
    assert(perRank.distinct.length == perRank.length)
    assert(got.map(_.getLong(1)).distinct.length == got.length)
  }

  test("nn-descent refine: two-hop shortcut joins the top-g, seed edges survive") {
    // chain graph a->b->c where (a, c) is the best edge a could have:
    // one descent round must discover it via the b hop; unioning the
    // banded seed back in (the nswRefineAudit contract) keeps a->b too
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val embs = Seq((10L, at(0.0)), (11L, at(50.0)), (12L, at(4.0)))
      .toDF("vec_id", "embedding")
    val tSide = embs.select(col("vec_id").as("t_id"),
      col("embedding").as("t_emb"),
      sqrt(Similarity.dotCol(col("embedding"), col("embedding")))
        .as("t_norm"))
    val seed = Seq((10L, 11L), (11L, 12L)).toDF("a_id", "b_id")
    val refined = Similarity.nnDescentRefine(seed, tSide, g = 1,
      refineRounds = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // node 10's top-1 becomes the two-hop 12 (cos 4deg > cos 50deg)
    assert(refined.contains((10L, 12L)), s"got $refined")
    assert(!refined.contains((10L, 11L)))
    // zero rounds is the identity
    val zero = Similarity.nnDescentRefine(seed, tSide, g = 1,
      refineRounds = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero == Set((10L, 11L), (11L, 12L)))
  }

  test("nsw refine audit: union graph keeps recall at or above the banded build") {
    // the s40 shape on the angular-chain fixture: exact-integer hit
    // counts for both variants, refined >= banded by the union contract
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val targets = (10 to 29).map(i => (i.toLong, at((i - 10) * 4.0)))
    val embs = ((0L, at(76.0)) +: targets).toDF("vec_id", "embedding")
    val r = Similarity.nswRefineAudit(embs, nQueries = 1, nPlanes = 8,
      bandBits = 4, g = 4, beam = 2, rounds = 4, k = 3,
      refineRounds = 1).collect()(0)
    assert(r.getLong(2) == 3L) // n_rows = k for one query
    assert(r.getLong(1) >= r.getLong(0), s"refined ${r.getLong(1)} < banded")
    assert(r.getBoolean(3))
  }

  test("nsw search never strays outside graph-reachable scored nodes") {
    // two disconnected angular islands: queries near island B, but the
    // entry points (lowest ids) are island A — with g=1 the graph has
    // no bridge, so results stay inside island A and in_exact is false
    def at(deg: Double) = vec(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val islandA = (10 to 13).map(i => (i.toLong, at((i - 10) * 2.0)))
    val islandB = (14 to 17).map(i => (i.toLong, at(170.0 + (i - 14) * 2.0)))
    val embs = ((0L, at(171.0)) +: (islandA ++ islandB))
      .toDF("vec_id", "embedding")
    val got = Similarity.nswSearch(embs, nQueries = 1, g = 1, beam = 2,
      rounds = 6, k = 2).collect()
    assert(got.forall(r => r.getLong(1) >= 10L && r.getLong(1) <= 13L))
    assert(got.forall(!_.getBoolean(4)), "island B holds the exact hits")
  }

  test("silhouette: separated blobs score near 1, shuffled labels go negative") {
    // two tight, far-apart blobs labeled correctly
    val good = Seq(
      (1L, vec(0f, 0f), 0), (2L, vec(0.01f, 0f), 0), (3L, vec(0f, 0.01f), 0),
      (4L, vec(10f, 10f), 1), (5L, vec(10.01f, 10f), 1),
      (6L, vec(10f, 10.01f), 1))
      .toDF("vec_id", "embedding", "label")
    val g = Similarity.silhouette(good).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g(0)._1 == 3L && g(1)._1 == 3L)
    assert(g(0)._2 > 0.99 && g(1)._2 > 0.99)
    // same points, labels split ACROSS the blobs: each cluster mixes
    // the two blobs, so the stray members' big negatives (≈ −0.67)
    // outweigh the local members' small positives (≈ +0.25) — the
    // per-label means go (just) negative
    val bad = Seq(
      (1L, vec(0f, 0f), 0), (2L, vec(0.01f, 0f), 1), (3L, vec(0f, 0.01f), 0),
      (4L, vec(10f, 10f), 1), (5L, vec(10.01f, 10f), 0),
      (6L, vec(10f, 10.01f), 1))
      .toDF("vec_id", "embedding", "label")
    val b = Similarity.silhouette(bad).collect().map(_.getDouble(2))
    assert(b.forall(_ < 0.0))
  }

  test("silhouette: singleton cluster scores 0 by convention") {
    val embs = Seq(
      (1L, vec(0f, 0f), 0), (2L, vec(1f, 0f), 0),
      (3L, vec(5f, 5f), 9)) // label 9 is a singleton
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.silhouette(embs).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(9) == 0.0)
  }

  test("pcaPower: rank-1 cloud converges to the exact integer direction") {
    // points on the (3,4) line in units of 1/1024 (dyadic — quantizes
    // exactly): centered scatter is 14*[[9,12],[12,16]], rank-1, so one
    // round lands the fixed point v = (3/4*512, 512) = (384, 512)
    val embs = Seq(
      (1L, vec(3f / 1024, 4f / 1024)),
      (2L, vec(-3f / 1024, -4f / 1024)),
      (3L, vec(6f / 1024, 8f / 1024))).toDF("vec_id", "embedding")
    val got = Similarity.pcaPower(embs, rounds = 4).collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 384L), (1, 512L)))
    val lam = got.map(_.getLong(2)).distinct
    assert(lam.length == 1 && lam.head > 0L)
  }

  test("pcaPower: negative-correlation direction keeps its sign structure") {
    val embs = Seq(
      (1L, vec(3f / 1024, -4f / 1024)),
      (2L, vec(-3f / 1024, 4f / 1024)),
      (3L, vec(6f / 1024, -8f / 1024))).toDF("vec_id", "embedding")
    val got = Similarity.pcaPower(embs, rounds = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> -384L, 1 -> 512L))
  }

  test("kmeansLloyd: two separated blobs converge to their exact integer means") {
    // seeds are the 2 lowest ids — one lands in each blob, so one
    // round already assigns perfectly and the means are exact
    val embs = Seq(
      (1L, vec(0f, 0f)), (3L, vec(4f / 1024, 0f)), (4L, vec(8f / 1024, 0f)),
      (2L, vec(1f, 1f)), (5L, vec(1f + 4f / 1024, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(embs, k = 2, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // blob A quantized xs: 0, 4, 8 -> mean 4; blob B: 1024, 1028 -> 1026
    assert(got((0, 0)) == (4L, 3L) && got((0, 1)) == (0L, 3L))
    assert(got((1, 0)) == (1026L, 2L) && got((1, 1)) == (1024L, 2L))
  }

  test("kmeansLloyd: duplicate seed empties a cell; it keeps its seed centroid") {
    // both seeds identical (1024, 0): round-1 ties all send everything
    // to cell 0 (min c_id), so cell 1 is EMPTY at update time and must
    // keep its seed centroid. c0 moves to the truncating mean
    // (2560/3 = 853, 0) — whereupon the two vectors sitting exactly on
    // the unchanged c1 seed flip to it in the final-size assignment.
    val embs = Seq((1L, vec(1f, 0f)), (2L, vec(1f, 0f)), (3L, vec(0.5f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansLloyd(embs, k = 2, rounds = 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((0, 0)) == (853L, 1L), "c0 took the truncating mean")
    assert(got((1, 0)) == (1024L, 2L), "empty-at-update cell kept its seed")
    assert(got((0, 1)) == (0L, 1L) && got((1, 1)) == (0L, 2L))
  }

  test("pcaPower: empty corpus fails loudly, not with an obscure empty.max") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.pcaPower(empty, rounds = 2).collect()
    }
    assert(e.getMessage.contains("empty corpus"))
  }
}
