package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB design point.
  *
  * - Bucketing: pre-shuffle a fact table once at write time so every
  *   subsequent equi-join/aggregation on the bucket key runs with NO
  *   exchange. At cluster scale this converts the dominant recurring
  *   shuffle of a star-join workload into a one-time write cost.
  * - Salting: spread a skewed hot key across `salt` sub-keys; the
  *   build side is exploded to every salt so the join stays an
  *   equi-join. AQE's skew-join handles moderate skew automatically;
  *   salting is for the pathological single-hot-key case AQE splits
  *   poorly (e.g. one user with 30% of all events).
  */
object Layout {

  /** Write df bucketed+sorted by key into the session warehouse as
    * `table`. Joins/aggs on `key` against other tables bucketed the
    * same way are exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key form: bucket by ALL the join's keys — Spark requires the
    * partitioning to carry every cluster key for co-partitioned joins
    * (`spark.sql.requireAllClusterKeysForCoPartition`, default true),
    * so bucketing a subset would be planned with an exchange anyway.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Catalog name for a persisted-state table over `path`: MD5 of the
    * path keeps the name collision-free across distinct state dirs in
    * one session (31-bit `String.hashCode` cannot, and
    * `math.abs(Int.MinValue)` is negative — an invalid identifier).
    */
  def stateTableName(prefix: String, path: String): String =
    prefix + "_" + java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(12)

  /** Ensure an EXTERNAL parquet table named `table` exists over `path`,
    * partitioned by a `batch BIGINT` column and bucketed+sorted by
    * `keys`. This is the persisted-state shape for incremental
    * operators (e.g. streaming dedup's band table): each micro-batch
    * overwrites only its own `batch=<id>` partition ([[overwriteBatch]])
    * while every probe reads the table bucket-partitioned — the corpus
    * side of a probe equi-join on `keys` plans with NO Exchange.
    *
    * The files under `path` are the durable state; the catalog entry is
    * not (local sessions use an in-memory catalog), so re-registration
    * after a restart recovers the existing `batch=` partitions from the
    * filesystem.
    */
  def ensureBucketedBatchTable(spark: SparkSession, table: String, path: String,
                               dataCols: Seq[(String, String)],
                               keys: Seq[String], buckets: Int): Unit = {
    if (!spark.catalog.tableExists(table)) {
      // RECOVER PARTITIONS lists the location; make sure it exists even
      // before the first batch has written anything
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
      val colsDdl = (dataCols.map { case (n, t) => s"$n $t" } :+ "batch BIGINT")
        .mkString(", ")
      spark.sql(
        s"""CREATE TABLE $table ($colsDdl) USING parquet
           |PARTITIONED BY (batch)
           |CLUSTERED BY (${keys.mkString(", ")})
           |SORTED BY (${keys.mkString(", ")}) INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
      ()
    }
  }

  /** Overwrite EXACTLY the `batch=<batchId>` partition of a
    * [[ensureBucketedBatchTable]] table with `df` (which must carry the
    * table's data columns; order-insensitive). Dynamic partition
    * overwrite makes the write idempotent under at-least-once replay:
    * re-running the same (df, batchId) rewrites the same partition with
    * the same content, and never touches other batches.
    */
  /** The partitionOverwriteMode toggle below mutates SESSION-global
    * conf; two concurrent foreachBatch writers on one session (e.g.
    * StreamDedup + StreamSimilarity) could interleave so one restores
    * "static" while the other's insertInto is still planning — which
    * would truncate every batch partition. All toggle+write sequences
    * are serialized through this lock (driver-side only; the writes
    * themselves still run distributed).
    */
  private val overwriteModeLock = new Object

  def overwriteBatch(df: DataFrame, table: String, batchId: Long): Unit =
    overwriteModeLock.synchronized {
      val spark = df.sparkSession
      val ordered = spark.table(table).columns.toSeq
      // insertInto ignores writer options; dynamic-vs-static lives in the
      // session conf (static would truncate ALL batches, not just this one)
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "dynamic")
      try df.withColumn("batch", lit(batchId))
        .select(ordered.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .insertInto(table)
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  /** Salted equi-join of a skewed left side with a smaller right side
    * on `key`: left rows get a deterministic salt from a high-entropy
    * sibling column, right rows are replicated to all salts.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, entropyCol: String): DataFrame =
    saltedJoin(left, right, Seq(key), salts, entropyCol)

  /** Compound-key form of [[saltedJoin]]: every qualifying pair meets
    * on exactly one (keys..., salt) combination — the left row's salt —
    * so the result multiset is identical to the unsalted join while a
    * hot key's rows spread over `salts` reduce partitions.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, entropyCol: String): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(entropyCol)), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, keys :+ "__salt").drop("__salt")
  }
}
