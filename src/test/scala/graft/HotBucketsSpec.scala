package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, HotBuckets, Similarity}

/** Adversarial hot-bucket fixtures: a 1,000-identical-docs cluster (or
  * a 1,000-identical-embeddings cluster) collapses into single LSH
  * buckets that would emit ~5e5 pairs from one task; the cap must keep
  * the run bounded, keep UNRELATED pairs discoverable through their own
  * cold buckets, and surface the skipped buckets in the report.
  */
class HotBucketsSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def cloneDocs: DataFrame = {
    import spark.implicits._
    val clones = (0L until 1000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog"))
    val pair = Seq(
      (1000L, "alpha bravo charlie delta echo foxtrot"),
      (1001L, "alpha bravo charlie delta echo foxtrot"))
    (clones ++ pair).toDF("doc_id", "text")
  }

  test("minhashDup: 1000-identical-docs bucket capped, cold pair still found") {
    val got = Dedup.minhashDup(cloneDocs, threshold = 0.5, maxBucket = 50)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the clone cluster contributes nothing; the unrelated exact pair
    // (identical signatures => guaranteed band collision, bucket of 2)
    // is still found
    assert(got == Set((1000L, 1001L)), s"got $got")
  }

  test("simhashDup: capped clone cluster, bounded and cold pair intact") {
    val got = Dedup.simhashDup(cloneDocs, maxHamming = 3, maxBucket = 50)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1000L, 1001L)), s"got $got")
  }

  test("hot-bucket report names the skipped buckets, prune drops them") {
    val bands = Dedup.minhashBands(Dedup.minhashSignatures(cloneDocs))
    val rep = HotBuckets.report(bands, Seq("band_idx", "band_key"), 50).collect()
    // the clone cluster: one 1000-member bucket per band
    assert(rep.length == Dedup.Bands, s"got ${rep.toSeq}")
    assert(rep.forall(_.getAs[Long]("n_members") == 1000L))
    val pruned = HotBuckets.prune(bands, Seq("band_idx", "band_key"), 50)
    // only the pair's 2-member buckets remain
    assert(pruned.count() == 2L * Dedup.Bands)
    // cap above the cluster size: prune is the identity
    assert(HotBuckets.prune(bands, Seq("band_idx", "band_key"), 1000).count()
      == bands.count())
  }

  test("lshCosineDupPairs: constant-embedding cluster capped") {
    import spark.implicits._
    val planes = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
    val clones = (2L until 1002L).map(i => (i, Array(1.0f, 1.0f)))
    val pair = Seq(
      (1002L, Array(-1.0f, -1.0f)), (1003L, Array(-1.0f, -1.0f)))
    val embs = (planes ++ clones ++ pair).toDF("vec_id", "embedding")
    val got = Similarity.lshCosineDupPairs(embs, nPlanes = 2,
      threshold = 0.9, maxBucket = 50)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // clones share sign-bucket (+,+); the pair's (-,-) bucket has 2
    // members and survives the cap
    assert(got == Set((1002L, 1003L)), s"got $got")
  }
}
