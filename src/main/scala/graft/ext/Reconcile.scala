package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Replica reconciliation: verify two versions of a table agree —
  * without shipping either table — by comparing per-bucket content
  * digests, then drilling into only the buckets that disagree.
  *
  * The 100 TB shape: phase 1 is one partial-aggregable groupBy per
  * side (the exchange carries `buckets` rows of counters, nothing
  * else); phase 2 joins full rows ONLY for the mismatched buckets —
  * on a healthy replica that is zero bytes. This is the Merkle-tree
  * anti-entropy pattern (Dynamo/Cassandra repair) flattened to one
  * digest level, which is all a two-phase batch engine needs.
  *
  * Digests are order-independent SUMs of the portable row hash
  * ([[Hashing.h32]] over the concatenated row), so they are exact in
  * any partitioning and verifiable cross-engine. Envelope: h32 < 2^32,
  * so the Long sum is overflow-safe below ~2^31 rows per bucket —
  * size `buckets` so per-bucket cardinality stays under that (the
  * same sizing exercise as any bucketed layout).
  */
object Reconcile {

  /** Portable per-row content hash over `cols`, null-safe: NULL and the
    * string "null" must not collide, so each column is prefixed with a
    * length-free marker via coalesce onto a reserved token.
    */
  def rowHash(cols: Seq[Column]): Column =
    Hashing.h32(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** DuckDB twin of [[rowHash]]. */
  def rowHashSql(cols: Seq[String]): String =
    Hashing.h32Sql("concat_ws(chr(1), " +
      cols.map(c => s"coalesce(CAST($c AS VARCHAR), chr(2))").mkString(", ") + ")")

  /** Per-bucket (bucket, n, digest) of a table — the mergeable Merkle
    * leaf: digests are order-independent h32 sums, so partial digests
    * from disjoint row sets (e.g. micro-batches,
    * [[graft.streaming.StreamReconcile]]) combine by plain addition.
    */
  def bucketDigests(t: DataFrame, keyCol: String, cols: Seq[String],
                    buckets: Int): DataFrame =
    t.select(pmod(Hashing.h32(col(keyCol).cast("string")), lit(buckets))
        .as("bucket"),
      rowHash(cols.map(col)).as("rh"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("rh")).as("digest"))

  private def digests(t: DataFrame, keyCol: String, cols: Seq[String],
                      buckets: Int, side: String): DataFrame =
    bucketDigests(t, keyCol, cols, buckets)
      .select(col("bucket"), col("n").as(s"n_$side"),
        col("digest").as(s"digest_$side"))

  /** Phase 1: per-bucket (count, digest) for both sides, full outer on
    * bucket id, `is_match` when both agree. Output has exactly
    * `buckets` rows however large the tables are.
    */
  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
                cols: Seq[String], buckets: Int): DataFrame = {
    val da = digests(a, keyCol, cols, buckets, "a")
    val db = digests(b, keyCol, cols, buckets, "b")
    da.join(db, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("digest_a"), lit(0L)).as("digest_a"),
        coalesce(col("digest_b"), lit(0L)).as("digest_b"))
      .withColumn("is_match",
        col("n_a") === col("n_b") && col("digest_a") === col("digest_b"))
      .orderBy(col("bucket"))
  }

  /** Phase 2: row-level drill restricted to mismatched buckets — a
    * semi-join of each side against the (tiny) mismatched-bucket set,
    * then a full outer join on the key classifying every divergent row
    * as added / deleted / modified. Rows in agreeing buckets never
    * enter the join.
    */
  def tableDiffDrill(a: DataFrame, b: DataFrame, keyCol: String,
                     cols: Seq[String], buckets: Int): DataFrame = {
    val bad = tableDiff(a, b, keyCol, cols, buckets)
      .filter(!col("is_match")).select(col("bucket"))
    def withBucket(t: DataFrame, side: String): DataFrame =
      t.select(col(keyCol),
        pmod(Hashing.h32(col(keyCol).cast("string")), lit(buckets))
          .as("bucket"),
        rowHash(cols.map(col)).as(s"rh_$side"))
        .join(broadcast(bad), Seq("bucket"), "left_semi")
    val l = withBucket(a, "a")
    val r = withBucket(b, "b").withColumnRenamed(keyCol, "__kb")
      .drop("bucket")
    l.join(r, col(keyCol) === col("__kb"), "full_outer")
      .withColumn("status",
        when(col("rh_a").isNull, lit("added"))
          .when(col("rh_b").isNull, lit("deleted"))
          .when(col("rh_a") =!= col("rh_b"), lit("modified")))
      .filter(col("status").isNotNull)
      .select(coalesce(col(keyCol), col("__kb")).as(keyCol), col("status"))
      .orderBy(col(keyCol))
  }
}
