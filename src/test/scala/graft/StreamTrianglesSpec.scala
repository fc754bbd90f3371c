package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ext.Graphs
import graft.streaming.StreamTriangles

/** Streaming incremental triangles: per-batch deltas, incremental ==
  * batch on the final graph, replay idempotency, end-to-end readStream.
  */
class StreamTrianglesSpec extends SparkSpec {

  import spark.implicits._

  private var n = 0
  private def fresh(): (String, String) = {
    n += 1
    val base = Files.createTempDirectory(s"st_tri$n").toString
    (base + "/state", base + "/out")
  }

  private def edgesDf(rows: Seq[(Long, Long)]) = rows.toDF("src", "dst")

  private def deltasOf(outDir: String): Map[Long, Long] =
    spark.read.parquet(outDir).groupBy("k")
      .agg(sum("d_tri").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental deltas across batches sum to the batch recount") {
    val (state, out) = fresh()
    val b0 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    // b1 re-adds (1,2) (a no-op) and closes three new triangles:
    // {1,3,4}, {1,2,4}, and {2,3,4} (old 2-3 + new 3-4 + new 2-4)
    val b1 = Seq((3L, 4L), (4L, 1L), (2L, 4L), (1L, 2L))
    StreamTriangles.processBatch(spark, edgesDf(b0), 0L, state, out, 4)
    StreamTriangles.processBatch(spark, edgesDf(b1), 1L, state, out, 4)
    val d0 = spark.read.parquet(s"$out/batch=0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d0 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val d1 = spark.read.parquet(s"$out/batch=1").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
    // the invariant: cumulative deltas == triangleCounts on the union
    val batch = Graphs.triangleCounts(edgesDf(b0 ++ b1).withColumn("w", lit(1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      .filter(_._2 > 0)
    assert(deltasOf(out) == batch)
  }

  test("replaying a batch rewrites identical delta and state partitions") {
    val (state, out) = fresh()
    val b0 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val b1 = Seq((3L, 4L), (4L, 1L))
    StreamTriangles.processBatch(spark, edgesDf(b0), 0L, state, out, 4)
    StreamTriangles.processBatch(spark, edgesDf(b1), 1L, state, out, 4)
    val before = (spark.read.parquet(out).collect().toSet,
      spark.read.parquet(state).collect().toSet)
    StreamTriangles.processBatch(spark, edgesDf(b1), 1L, state, out, 4) // replay
    val after = (spark.read.parquet(out).collect().toSet,
      spark.read.parquet(state).collect().toSet)
    assert(after == before)
  }

  test("end-to-end readStream counts two micro-batches") {
    val (state, out) = fresh()
    val landing = Files.createTempDirectory("st_tri_landing").toString
    val ckpt = Files.createTempDirectory("st_tri_ckpt").toString
    Files.writeString(Paths.get(landing, "b0.json"),
      """{"src": 1, "dst": 2}
        |{"src": 2, "dst": 3}
        |{"src": 3, "dst": 1}""".stripMargin)
    StreamTriangles.run(spark, landing, state, out, ckpt, 4)
      .awaitTermination()
    Files.writeString(Paths.get(landing, "b1.json"),
      """{"src": 3, "dst": 4}
        |{"src": 4, "dst": 1}""".stripMargin)
    StreamTriangles.run(spark, landing, state, out, ckpt, 4)
      .awaitTermination()
    assert(deltasOf(out) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}
