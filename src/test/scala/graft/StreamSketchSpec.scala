package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.streaming.StreamSketch

class StreamSketchSpec extends SparkSpec {

  import spark.implicits._

  private def writeUsers(dir: String, name: String, ids: Seq[Long]): Unit = {
    Files.writeString(Paths.get(dir, name),
      ids.map(i => s"""{"user_id": $i}""").mkString("\n"))
    ()
  }

  test("streaming HLL: batch registers merge to the one-pass estimate") {
    val landing = Files.createTempDirectory("sk_landing").toString
    val state = Files.createTempDirectory("sk_state").toString
    val ckpt = Files.createTempDirectory("sk_ckpt").toString

    writeUsers(landing, "b1.json", 0L until 100L)
    StreamSketch.run(spark, landing, state, ckpt).awaitTermination()
    writeUsers(landing, "b2.json", 50L until 150L) // 50 overlap
    StreamSketch.run(spark, landing, state, ckpt).awaitTermination()

    val streamed = spark.read.parquet(s"$state/estimate")
      .select("estimate").collect().head.getDouble(0)
    // the merged streamed estimate must EQUAL the one-pass estimate over
    // the union of all users — the d18 register-merge identity, here
    // across micro-batch state instead of hourly slices
    val direct = Dedup.hllEstimate(
        Dedup.hllRegisters((0L until 150L).toDF("user_id"), col("user_id")))
      .select("estimate").collect().head.getDouble(0)
    assert(streamed == direct, s"streamed $streamed vs direct $direct")

    // replay of the last batch (at-least-once delivery) changes nothing
    val b2 = (50L until 150L).toDF("user_id")
    StreamSketch.processBatch(spark, b2, 1L, state, 8)
    val after = spark.read.parquet(s"$state/estimate")
      .select("estimate").collect().head.getDouble(0)
    assert(after == streamed, "replay changed the estimate")
    // state is registers only: at most 2^p rows per batch
    assert(spark.read.parquet(s"$state/regs").count() <= 2L * 256)
  }
}
