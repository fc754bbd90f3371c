package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Source/sink format coverage beyond the pipeline's parquet/csv/json:
  * ORC round-trip, JSON-lines round-trip, and partitioned writes with
  * partition pruning visible in the plan (the scan-reduction mechanism
  * that matters most at 100 TB).
  */
class FormatsSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"
  private def tmp = Files.createTempDirectory("graft_fmt").toString

  test("normalizedTs: int64-nanos and NTZ-micros fixtures land on identical instants") {
    import spark.implicits._
    // the same three instants, once as raw int64 nanos (pre-round-7
    // fixtures surfaced via nanosAsLong) and once as TIMESTAMP_NTZ
    // micros (the regenerated fixtures) — normalization must agree
    val micros = Seq(0L, 1704067200123456L, 1706655976220708L)
    val asNanos = micros.map(_ * 1000 + 999).toDF("ts") // sub-us residue truncates
    val asNtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val a = asNanos.select(Tables.normalizedTs(asNanos).as("ts"))
    val b = asNtz.select(Tables.normalizedTs(asNtz).as("ts"))
    assert(a.schema("ts").dataType.typeName == "timestamp")
    assert(b.schema("ts").dataType.typeName == "timestamp")
    val ga = a.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    val gb = b.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
    assert(ga.toSeq == micros.sorted && gb.toSeq == micros.sorted)
  }

  test("ORC round-trip preserves schema and rows") {
    val o = Tables.load(spark, sf, "orders")
    val dir = s"$tmp/orders_orc"
    o.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == o.schema)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).count() == 0)
  }

  test("JSON-lines round-trip (timestamps survive ISO text)") {
    val o = Tables.load(spark, sf, "orders")
    val dir = s"$tmp/orders_json"
    o.write.json(dir)
    val back = spark.read.schema(o.schema).json(dir)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).count() == 0)
  }

  test("partitioned parquet write prunes partitions in the plan") {
    val o = Tables.load(spark, sf, "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    val dir = s"$tmp/orders_part"
    o.write.partitionBy("order_year").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1998)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan)

    val expected = o.filter(col("order_year") === 1998).count()
    assert(pruned.count() == expected && expected > 0)

    // pruning actually reduces files read: one partition dir only
    val dirs = Files.list(java.nio.file.Paths.get(dir)).iterator()
    var partDirs = 0
    while (dirs.hasNext) {
      if (dirs.next().getFileName.toString.startsWith("order_year=")) partDirs += 1
    }
    assert(partDirs > 1, s"expected multiple year partitions, got $partDirs")
  }
}
