package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * single-parquet-per-table layout here is the driver's test fixture.
  * All queries go through these helpers so a real deployment only has
  * to swap the path scheme (e.g. s3://.../table/ with partition dirs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped with two physical types for `ts`
    // across driver generations: TIMESTAMP(NANOS) (which Spark's
    // vectorized reader only surfaces as raw int64 nanos) and plain
    // TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ). Normalize BOTH to
    // the session-zone TIMESTAMP the whole engine was written against:
    // nanos truncate to micros exactly like DuckDB (ns div 1000,
    // toward zero); NTZ micros cast wall-clock-preserving (session
    // zone is UTC in every entrypoint).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", normalizedTs(df)) else df
  }

  /** `ts` as session-zone TIMESTAMP regardless of the fixture's
    * physical type (int64 nanos, TIMESTAMP_NTZ, or already TIMESTAMP).
    */
  private[graft] def normalizedTs(df: DataFrame)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    df.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
  }

  /** Register every table as a temp view so spark.sql(...) queries work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Spread a narrow scan across the session's shuffle-partition count.
    * The driver fixtures are single-row-group parquet, so a scan is ONE
    * input split for any engine — fine for IO, serial for CPU. Call
    * this before expression-heavy projections (hashing, shingling,
    * vector math) so they run at full width; on a production layout
    * with real splits it degenerates to a cheap no-op-ish exchange.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
