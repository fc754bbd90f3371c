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
