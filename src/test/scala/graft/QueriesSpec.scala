package graft

import org.apache.spark.sql.functions._

import graft.analyze.CricketQueries
import graft.extract.Extractors
import graft.model.Cricsheet

/** Smoke + spot checks for the oracle-gated query surface (the full
  * value-level verification runs through Verify + the driver's DuckDB
  * compare) and value checks for the cricket A-workload.
  */
class QueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("every declared query runs and returns rows at sf0.001") {
    // w40: sf0.001 has only 2 full trailing-24h windows and no hour
    // beats 5/4x its baseline — an empty burst report is the correct
    // answer there (the sf0.01/sf0.1 oracle gates return 104/4 rows)
    val allowedEmpty = Set("q09_anti_join", "q13_except",
      "d01_dedup_exact_groups", "w40_bursts")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
      if (!allowedEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no query-name collisions across modules (map merge would drop one)") {
    val names =
      analyze.RelQueries.defs.map(_._1) ++ analyze.ExtQueries.defs.map(_._1) ++
        analyze.AdvQueries.defs.map(_._1) ++ analyze.OpQueries.defs.map(_._1)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == names.size)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("minhash dedup finds the planted near-duplicates at sf0.001") {
    val dups = graft.ext.Dedup.minhashDup(
      graft.core.Tables.load(spark, sf, "documents"), threshold = 0.5)
    val n = dups.count()
    assert(n > 0, "expected planted near-dup pairs")
    assert(dups.filter(col("jaccard") > 0.9).count() > 0)
  }

  test("brute-force ANN yields k neighbors per query in score order") {
    val topk = graft.ext.Similarity.bruteForceTopK(
      graft.core.Tables.load(spark, sf, "embeddings"), nQueries = 4, k = 3)
    val rows = topk.collect()
    assert(rows.length == 12)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      val scores = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cosine"))
      assert(scores.toSeq == scores.sorted.reverse.toSeq)
    }
  }

  test("banded cosine LSH recall >= single-table at equal total planes") {
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(graft.ext.Similarity
      .lshCosineDupPairs(embs, nPlanes = 8, threshold = 0.4))
    val banded = pairs(graft.ext.Similarity
      .bandedCosineDupPairs(embs, nBands = 2, rowsPerBand = 4, threshold = 0.4))
    val exact = pairs(graft.ext.Similarity
      .cosineDupPairs(embs, threshold = 0.4))
    // any-band collision is implied by all-planes collision: superset
    assert(single.subsetOf(banded), s"missing: ${single -- banded}")
    // every banded pair is exact-verified: no false positives
    assert(banded.subsetOf(exact), s"spurious: ${banded -- exact}")
  }

  test("IVF ANN scores agree with brute force on shared candidates") {
    val embs = graft.core.Tables.load(spark, sf, "embeddings")
    val ivf = graft.ext.Similarity
      .ivfTopK(embs, nCentroids = 8, nProbe = 2, nQueries = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(ivf.nonEmpty)
    // brute force ranks ALL targets; wherever IVF surfaced a pair, the
    // exact cosine must be identical (the approximation is in WHICH
    // candidates are scored, never in the scores)
    val brute = graft.ext.Similarity
      .bruteForceTopK(embs, nQueries = 4, k = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (pair, cos) =>
      assert(brute(pair) == cos, s"cosine mismatch for $pair")
    }
  }

  test("curation scalable paths equal their window twins") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val aggSample = graft.ext.Curation
      .stratifiedSample(docs, "lang", 7, scalable = true)
    val winSample = graft.ext.Curation
      .stratifiedSample(docs, "lang", 7, scalable = false)
    assert(aggSample.exceptAll(winSample).count() == 0)
    assert(winSample.exceptAll(aggSample).count() == 0)

    val prefixPack = graft.ext.Curation
      .packDocs(docs, "lang", "n_chars", 2048, scalable = true)
    val winPack = graft.ext.Curation
      .packDocs(docs, "lang", "n_chars", 2048, scalable = false)
    assert(prefixPack.exceptAll(winPack).count() == 0)
    assert(winPack.exceptAll(prefixPack).count() == 0)
  }

  test("curation edge cases: zero quotas, oversized quotas, empty input") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, sf, "documents")
    // per-stratum 0 -> empty, exercising the top-k k<=0 guard in-plan
    assert(graft.ext.Curation.stratifiedSample(docs, "lang", 0).count() == 0)
    // quota above stratum size -> whole stratum, no padding or crash
    val all = graft.ext.Curation
      .mixtureSample(docs, "lang", Map("en" -> 1000000))
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(all.count() == enTotal) // other langs dropped (no quota)
    // empty frame flows through packing
    val empty = Seq.empty[(Long, String, Long)].toDF("doc_id", "lang", "n_chars")
    assert(graft.ext.Curation.packDocs(empty, "lang", "n_chars", 64).count() == 0)
  }

  test("count-min estimates never under-count (CMS guarantee)") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val cms = graft.ext.TextAnalysis.countMinWords(docs, width = 128, topK = 20)
    assert(cms.count() == 20)
    assert(cms.filter(col("n_est") < col("n_exact")).count() == 0)
  }

  lazy val mw = graft.publish.PublishJob.buildMatchwise(
    Extractors.matchwise(Cricsheet.read(spark, fixturesDir))).cache()

  test("cricket A-workload over fixtures") {
    assert(CricketQueries.allTeams(mw).collect().map(_.getString(0)).toSeq ==
      Seq("Alpha", "Beta", "Cold", "Delta", "Eps", "Gamma",
        "Hot", "Iota", "Kappa", "Mu", "Nu", "Zeta"))

    val noRes = CricketQueries.noResultSplit(mw).collect().head
    assert(noRes.getAs[Long]("no_result") == 2)
    assert(noRes.getAs[Long]("completed") == 4)

    // completed non-tie matches: 1001 (toss winner won), 1002 (won),
    // 1004 (won) -> all true
    val tw = CricketQueries.tossWinnerWon(mw).collect()
    assert(tw.map(r => (r.getBoolean(0), r.getLong(1))).toSeq == Seq((true, 3L)))

    val margins = CricketQueries.marginSplit(mw).collect().head
    assert(margins.getAs[Long]("won_by_runs") == 1)
    assert(margins.getAs[Long]("won_by_wickets") == 2)

    assert(CricketQueries.matchesPerYear(mw).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((2020, 6L)))

    val toss = CricketQueries.tossDecisionCounts(mw).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(toss == Map("bat" -> 3L, "field" -> 3L))
  }

  test("SeqNumber equals single-task row_number on the star schema") {
    val orders = graft.core.Tables.load(spark, sf, "orders")
    val viaSeq = graft.operators.SeqNumber
      .withSeq(orders, Seq(col("o_orderdate"), col("o_orderkey")), "seq")
      .select(col("o_orderkey"), col("seq"))
    val viaWindow = orders.withColumn("seq",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
      .select(col("o_orderkey"), col("seq"))
    assert(viaSeq.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaSeq).count() == 0)
  }
}
