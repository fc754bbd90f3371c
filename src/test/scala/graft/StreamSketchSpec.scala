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

  test("streaming quantile sketch: merged batches equal the one-pass sketch") {
    val state = Files.createTempDirectory("skq_state").toString
    val k = 16
    def batchDf(ids: Seq[Long]) =
      ids.map(i => (i, i.toDouble)).toDF("event_id", "value")

    StreamSketch.processQuantileBatch(spark, batchDf(0L until 100L), 0L, state, k)
    StreamSketch.processQuantileBatch(spark, batchDf(100L until 200L), 1L, state, k)
    def est(dir: String): (Long, Double, Double) = {
      val r = spark.read.parquet(s"$dir/qestimate").collect().head
      (r.getAs[Long]("m"), r.getAs[Double]("p50_est"), r.getAs[Double]("p90_est"))
    }
    val streamed = est(state)
    assert(streamed._1 == k, "merged sample must cap at k")

    // KMV identity: the re-merged streamed sample IS the bottom-k of
    // every row ever seen, so a one-pass sketch over the union must
    // produce the IDENTICAL estimate
    val direct = Files.createTempDirectory("skq_direct").toString
    StreamSketch.processQuantileBatch(spark, batchDf(0L until 200L), 0L, direct, k)
    assert(est(direct) == streamed, s"streamed $streamed vs direct ${est(direct)}")

    // replay of the last batch changes nothing; per-batch state is <= k rows
    StreamSketch.processQuantileBatch(spark, batchDf(100L until 200L), 1L, state, k)
    assert(est(state) == streamed, "replay changed the estimate")
    assert(spark.read.parquet(s"$state/qsample").count() <= 2L * k)
  }

  test("streaming heavy hitters: sum-merged batches equal the one-pass top") {
    val state = Files.createTempDirectory("skh_state").toString
    def batchDf(ks: Seq[Long]) = ks.toDF("k")
    // value 7 is hot in both batches; 3 only in the first; ties (1,2)
    // must rank by lowest value
    val b0 = Seq.fill(10)(7L) ++ Seq.fill(6)(3L) ++ Seq(1L, 2L)
    val b1 = Seq.fill(5)(7L) ++ Seq.fill(8)(9L) ++ Seq(1L, 2L)
    StreamSketch.processHHBatch(spark, batchDf(b0), 0L, state, topN = 3)
    StreamSketch.processHHBatch(spark, batchDf(b1), 1L, state, topN = 3)
    def top(dir: String) = spark.read.parquet(s"$dir/top")
      .orderBy(col("rk")).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"), r.getAs[Int]("rk"))).toSeq
    val streamed = top(state)
    // global counts: 7->15, 9->8, 3->6, 1->2, 2->2
    assert(streamed == Seq((7L, 15L, 1), (9L, 8L, 2), (3L, 6L, 3)), s"$streamed")
    // one-pass over the union produces the identical snapshot
    val direct = Files.createTempDirectory("skh_direct").toString
    StreamSketch.processHHBatch(spark, batchDf(b0 ++ b1), 0L, direct, topN = 3)
    assert(top(direct) == streamed)
    // replay idempotency
    StreamSketch.processHHBatch(spark, batchDf(b1), 1L, state, topN = 3)
    assert(top(state) == streamed, "replay changed the top")
  }

  test("streaming Misra-Gries: bounded state, stream-wide guarantees, replay") {
    val state = Files.createTempDirectory("skmg_state").toString
    val k = 8
    def batchDf(ts: Seq[String]) = ts.toDF("tok")
    // heavy token "hot" spread across batches (never batch-locally
    // overwhelming); per-batch vocab 40 >> k so each batch's summary
    // genuinely decrements
    val b0 = Seq.fill(120)("hot") ++ (0 until 40).flatMap(i => Seq.fill(3)(s"a$i"))
    val b1 = Seq.fill(130)("hot") ++ (0 until 40).flatMap(i => Seq.fill(3)(s"b$i"))
    val b2 = Seq.fill(110)("hot") ++ (0 until 40).flatMap(i => Seq.fill(3)(s"c$i"))
    val batches = Seq(b0, b1, b2)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamSketch.processMgBatch(spark, batchDf(b), i.toLong, state, k)
      // bounded state: every batch partition holds <= k summary rows
      assert(spark.read.parquet(s"$state/mg/batch=$i").count() <= k)
    }
    def snap(): Map[String, Long] = spark.read.parquet(s"$state/mgtop")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = snap()
    val all = batches.flatten
    val n = all.size.toLong
    val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(heavy == Set("hot"), s"fixture heavy set: $heavy")
    assert(got.size <= k)
    heavy.foreach(t => assert(got.contains(t), s"heavy $t missing"))
    got.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth && (truth - est) * (k + 1) <= n,
        s"bound violated for $t: est=$est true=$truth n=$n")
    }
    // replay of the middle batch rebuilds the identical summary
    StreamSketch.processMgBatch(spark, batchDf(b1), 1L, state, k)
    assert(snap() == got, "replay changed the snapshot")
  }
}
