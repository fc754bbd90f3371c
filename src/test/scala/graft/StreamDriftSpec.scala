package graft

import java.nio.file.Files

import graft.streaming.StreamDrift

/** Streaming TV drift: exact rational identities on hand-computable
  * histograms, cumulative-equals-one-pass, and replay idempotence.
  */
class StreamDriftSpec extends SparkSpec {

  import spark.implicits._

  private def df(values: Seq[Double]) =
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")

  private def drift(state: String): (Long, Long, Long, Double) = {
    val r = spark.read.parquet(s"$state/drift").collect().head
    (r.getAs[Long]("n_cur_total"), r.getAs[Long]("n_ref_total"),
      r.getAs[Long]("tv_num"), r.getAs[Double]("tv"))
  }

  test("tv is 0 on the same distribution and 1 on disjoint supports") {
    val ref = StreamDrift.referenceHistogram(df(Seq(10.0, 10.0, 60.0)))
    val same = StreamDrift.tvDrift(
      StreamDrift.referenceHistogram(df(Seq(20.0, 20.0, 70.0)))
        .withColumnRenamed("n_ref", "n_cur"), ref).collect().head
    assert(same.getAs[Long]("tv_num") == 0L && same.getAs[Double]("tv") == 0.0)
    val disjoint = StreamDrift.tvDrift(
      StreamDrift.referenceHistogram(df(Seq(210.0, 260.0)))
        .withColumnRenamed("n_ref", "n_cur"), ref).collect().head
    // num = sum |c*3 - r*2| over bins {0,1} (ref) and {4,5} (cur)
    //     = (2*3 + 2*3)/... = 3+3+2+2 = 10? c bins: 1 each * 3 -> 3+3;
    // ref bins: 2*2, 1*2 -> 4+2; total 12 = 2*2*3 -> tv = 1.0
    assert(disjoint.getAs[Double]("tv") == 1.0)
  }

  test("streamed cumulative histogram equals the one-pass TV; replay is idempotent") {
    val ref = StreamDrift.referenceHistogram(
      df(Seq(10.0, 60.0, 110.0, 110.0)))
    val state = Files.createTempDirectory("drift_state").toString

    // two micro-batches with skewed values vs the reference
    StreamDrift.processBatch(spark, df(Seq(10.0, 10.0, 60.0)), 0L, state, ref)
    StreamDrift.processBatch(spark, df(Seq(10.0, 160.0)), 1L, state, ref)
    val streamed = drift(state)

    // one-pass over the concatenated input must give the IDENTICAL
    // integers (cumulative SUM over batch partitions = single groupBy)
    val direct = Files.createTempDirectory("drift_direct").toString
    StreamDrift.processBatch(spark,
      df(Seq(10.0, 10.0, 60.0, 10.0, 160.0)), 0L, direct, ref)
    assert(drift(direct) == streamed, s"${drift(direct)} vs $streamed")

    // hand check: cur bins {0:3, 1:1, 3:1}, ref {0:1, 1:1, 2:2};
    // ta=5, tb=4: |3*4-1*5|+|1*4-1*5|+|0*4-2*5|+|1*4-0*5| = 7+1+10+4 = 22
    assert(streamed._3 == 22L)
    assert(streamed._4 == 22.0 / (2.0 * 5 * 4))

    // at-least-once replay of batch 1 changes nothing
    StreamDrift.processBatch(spark, df(Seq(10.0, 160.0)), 1L, state, ref)
    assert(drift(state) == streamed, "replay changed the drift snapshot")
  }
}
