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
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read the raw int64 nanos and truncate to
    // micros exactly like DuckDB does (ns div 1000, toward zero).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
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
