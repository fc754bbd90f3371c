package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.Similarity
import graft.functions.VectorExpressions

class VectorExprSpec extends SparkSpec {

  lazy val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("codegen'd dot product is bit-identical to the HOF fold") {
    val both = embs.as("a").crossJoin(embs.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(5000)
      .select(
        VectorExpressions.dotD(col("a.embedding"), col("b.embedding")).as("fast"),
        Similarity.dotColHof(col("a.embedding"), col("b.embedding")).as("hof"))
    // exact bit equality, not approx: both fold ((0+p0)+p1)+... in double
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("dot_product_d is SQL-callable after registration") {
    VectorExpressions.register(spark)
    embs.createOrReplaceTempView("embs_v")
    val r = spark.sql(
      "SELECT dot_product_d(embedding, embedding) AS d FROM embs_v LIMIT 3")
      .collect()
    assert(r.forall(_.getDouble(0) > 0))
  }

  test("packed ngram intersect counts equal the string-array form") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(80)
    val a = docs.select(col("doc_id").as("a_id"),
      array_sort(graft.ext.TextOps.charNgrams(col("text"), 4)).as("sa"),
      array_sort(graft.functions.PackedCharNgrams(col("text"), 4)).as("pa"))
    val b = a.select(col("a_id").as("b_id"), col("sa").as("sb"), col("pa").as("pb"))
    val both = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(
        graft.functions.SortedIntersectCount(col("sa"), col("sb")).as("s"),
        graft.functions.SortedLongIntersectCount(col("pa"), col("pb")).as("p"),
        (size(col("sa")) - size(col("pa"))).as("dsz"))
    assert(both.filter(col("s") =!= col("p") || col("dsz") =!= 0).count() == 0)
  }

  test("one-pass MinhashSigOf equals the explode+aggregate formulation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = graft.ext.Dedup.minhashSignatures(docs)
    val viaAgg = graft.ext.Dedup.minhashSignaturesViaAgg(docs)
    assert(viaExpr.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.count() > 0)
  }

  test("one-pass ShingleHashesOf equals the HOF distinct+sort formulation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = graft.ext.Dedup.ShingleSize
    val viaExpr = docs.select(col("doc_id"),
      graft.functions.ShingleHashesOf(col("text"), n).as("hs"))
      .filter(col("hs").isNotNull)
    val viaHof = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        array_distinct(graft.ext.TextOps.wordShingles(col("text"), n)),
        s => graft.functions.Hashing.h32(s)))).as("hs"))
      .filter(size(col("hs")) > 0)
    assert(viaExpr.exceptAll(viaHof).count() == 0)
    assert(viaHof.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.count() > 0)
  }

  test("one-pass QualityCountsOf equals the HOF formulation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = graft.ext.TextAnalysis.qualityScore(docs)
    val viaHof = graft.ext.TextAnalysis.qualityScoreViaHof(docs)
    assert(viaExpr.exceptAll(viaHof).count() == 0)
    assert(viaHof.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.count() == docs.count())
  }

  test("one-pass SimhashOf equals the explode+aggregate formulation") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = graft.ext.Dedup.simhash(docs)
    val viaAgg = graft.ext.Dedup.simhashViaAgg(docs)
    assert(viaExpr.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.count() == docs.count())
  }

  test("top-k aggregator with k <= 0 returns empty, never throws") {
    val agg = new graft.functions.TopKAggregator(0)
    val fed = Seq(graft.functions.Scored(1L, 0.5), graft.functions.Scored(2L, 0.9))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(fed).isEmpty)
  }

  test("expression participates in whole-stage codegen") {
    val plan = embs.select(
      VectorExpressions.dotD(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in toString form
    assert(plan.contains("*(1) Project [dot_product_d"), plan)
  }
}
