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

  test("MatProjectF equals the inlined literal +/- fold, bit for bit") {
    val (inD, outD) = (64, 16)
    val signs = Similarity.jlSigns(inD, outD)
    val viaExpr = Similarity.jlProject(embs, inD, outD) // MatProjectF inside
    val proj = (0 until outD).map { k =>
      (0 until inD).foldLeft(lit(0.0)) { (acc, j) =>
        val x = element_at(col("embedding"), j + 1).cast("double")
        if (signs(k)(j) > 0) acc + x else acc - x
      }.cast("float")
    }
    val viaFold = embs.select(col("vec_id"), array(proj: _*).as("embedding"))
    assert(viaExpr.exceptAll(viaFold).count() == 0)
    assert(viaFold.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.count() == embs.count())
    // an input shorter than inDims projects to null, mirroring the
    // fold's null propagation — never a partial sum
    val short = embs.select(col("vec_id"),
      slice(col("embedding"), 1, inD - 1).as("embedding"))
    val projected = Similarity.jlProject(short, inD, outD)
    assert(projected.filter(col("embedding").isNotNull).count() == 0)
  }

  test("HyperplaneBucketL equals the per-plane dot chain") {
    val planes = embs.orderBy(col("vec_id")).limit(8).collect()
      .map(_.getSeq[Float](1).toArray).toSeq
    val viaExpr = embs.select(col("vec_id"),
      VectorExpressions.hyperplaneBucket(col("embedding"),
        planes.map(_.toSeq)).as("b"))
    val chain = planes.zipWithIndex.map { case (p, j) =>
      when(VectorExpressions.dotD(col("embedding"), typedLit(p)) > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val viaChain = embs.select(col("vec_id"), chain.as("b"))
    assert(viaExpr.exceptAll(viaChain).count() == 0)
    assert(viaChain.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.select(countDistinct(col("b"))).head.getLong(0) > 1)
  }

  test("CentroidDistancesD equals the aggregate(zip_with) chain, ties to low id") {
    val vecs = embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val cents = vecs.orderBy(col("vec_id")).limit(5).collect()
      .map(r => (100L + r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val viaExpr = vecs.select(col("vec_id"),
        explode(VectorExpressions.centroidDistances(col("v"),
          cents.map { case (cid, c) => cid -> c.toSeq })).as("e"))
      .select(col("vec_id"), col("e.cluster"), col("e.dist2"))
    def dist2To(c: Array[Double]) =
      aggregate(zip_with(col("v"), array(c.map(lit): _*),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)
    val viaHof = vecs.select(col("vec_id"),
        explode(array(cents.map { case (cid, c) =>
          struct(dist2To(c).as("dist2"), lit(cid).as("cluster")) }: _*)).as("e"))
      .select(col("vec_id"), col("e.cluster"), col("e.dist2"))
    assert(viaExpr.exceptAll(viaHof).count() == 0)
    assert(viaHof.exceptAll(viaExpr).count() == 0)
    // argmin via array_min: a vector equidistant to two centroids (a
    // centroid vector duplicated under a HIGHER id) ties to the lower
    val dup = cents.take(1) ++ Seq((999L, cents.head._2))
    val best = vecs.filter(col("vec_id") === (cents.head._1 - 100L))
      .select(array_min(VectorExpressions.centroidDistances(col("v"),
        dup.map { case (cid, c) => cid -> c.toSeq })).as("best"))
      .select(col("best.cluster")).head.getLong(0)
    assert(best == cents.head._1)
  }

  test("expression participates in whole-stage codegen") {
    val plan = embs.select(
      VectorExpressions.dotD(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage in toString form
    assert(plan.contains("*(1) Project [dot_product_d"), plan)
  }
}
