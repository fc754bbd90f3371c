package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket capping for LSH candidate self-joins.
  *
  * Candidate generation in the minhash/simhash/cosine-LSH families is
  * an equi-self-join on bucket keys; pair count inside one bucket is
  * quadratic in its size. Normal corpora keep buckets small, but a
  * pathological cluster (thousands of empty/identical texts,
  * near-constant embeddings) makes ONE bucket produce more pairs than
  * the rest of the corpus combined — a single task computing n^2/2
  * pairs, unkillable at 100 TB. The cap removes members of buckets
  * larger than `maxBucket` from candidate generation BEFORE the join;
  * [[report]] surfaces exactly what was skipped (never a silent drop —
  * the operator's caller quarantines or re-blocks those docs; pairs
  * whose docs also share a NORMAL bucket are still found through it).
  *
  * Cost: one count aggregation on the banded table (same partitioning
  * as the join it protects) and a broadcast anti-join against the few
  * hot keys.
  */
object HotBuckets {

  /** Members of over-`maxBucket` buckets removed.
    *
    * Short-circuit: when the WHOLE banded table holds at most
    * `maxBucket` rows, no bucket can exceed the cap — one O(partitions)
    * count on the (caller-checkpointed) input replaces the count
    * aggregation and anti-join jobs entirely. The fixed per-job
    * overhead of the full path is noise at production scale but
    * measurable at test scale; the short-circuit keeps the guard free
    * exactly where it cannot trigger.
    */
  def prune(banded: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame = {
    if (maxBucket == Int.MaxValue) return banded
    if (banded.count() <= maxBucket) return banded
    val hot = banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keyCols.map(col): _*)
    banded.join(broadcast(hot), keyCols, "left_anti")
  }

  /** (keys..., n_members) for every bucket over the cap — the
    * quarantine report that makes the cap auditable.
    */
  def report(banded: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame =
    banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucket)
      .orderBy(col("n_members").desc +: keyCols.map(col): _*)
}
