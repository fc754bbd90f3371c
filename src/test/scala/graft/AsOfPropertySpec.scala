package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** Property test: the union+window as-of join and the native merge exec
  * agree on random inputs — including duplicate timestamps, keys with
  * rows on only one side, and empty sides.
  */
class AsOfPropertySpec extends SparkSpec {

  private def forSamples[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val rowGen = for {
    key <- Gen.choose(0L, 6L)      // few keys -> dense collisions
    tsSec <- Gen.choose(0L, 50L)   // small range -> duplicate timestamps
    v <- Gen.choose(0L, 1000L)
  } yield (key, tsSec, v)

  private def df(rows: Seq[(Long, Long, Long)], valueName: String) = {
    import spark.implicits._
    rows.toDF("user_id", "sec", valueName)
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      // dedupe to one row per (key, ts): the as-of contract expects a
      // unique right row per timestamp
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col(valueName)).as(valueName))
  }

  test("native exec and union+window agree on random inputs") {
    forSamples(for {
      l <- Gen.listOfN(40, rowGen)
      r <- Gen.listOfN(40, rowGen)
    } yield (l, r), 6) { case (l, r) =>
      val left = df(l, "lv")
      // ~25% null payload values: the matched-but-null-field case must
      // stay null (not be back-filled from an older right row)
      val right = df(r, "rv").withColumn("rv",
        when(col("rv") % 4 === 0, lit(null)).otherwise(col("rv")))
      val a = AsOfJoin.lastBefore(left, right, "user_id", "ts", Seq("rv"))
      val b = AsOfJoinNative.lastBefore(left, right, "user_id", "ts", Seq("rv"))
      assert(a.exceptAll(b).count() == 0,
        a.exceptAll(b).limit(5).collect().mkString("; "))
      assert(b.exceptAll(a).count() == 0)
      assert(a.count() == left.count())
    }
  }

  test("null payload on the latest right row is NOT back-filled from older rows") {
    val left = df(Seq((1L, 20L, 0L)), "lv")
    val right = df(Seq((1L, 5L, 7L), (1L, 10L, 0L)), "rv")
      // latest matching right row (ts=10) carries a null payload; the
      // older row (ts=5, rv=7) must not leak into it
      .withColumn("rv", when(col("rv") === 0L, lit(null)).otherwise(col("rv")))
    Seq(AsOfJoin.lastBefore(left, right, "user_id", "ts", Seq("rv")),
        AsOfJoinNative.lastBefore(left, right, "user_id", "ts", Seq("rv")))
      .foreach { out =>
        val row = out.collect()(0)
        assert(row.getAs[Timestamp]("asof_ts").getTime == 10000L)
        assert(row.isNullAt(row.fieldIndex("asof_rv")))
      }
  }

  test("payload or left columns colliding with internal names are rejected") {
    val left = df(Seq((1L, 5L, 10L)), "lv")
    val right = df(Seq((1L, 3L, 7L)), "rv").withColumn("__t", col("rv"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.lastBefore(left, right, "user_id", "ts", Seq("rv", "__t"))
    }
    assert(e.getMessage.contains("__t"))
    intercept[IllegalArgumentException] {
      AsOfJoin.lastBefore(left.withColumn("__side", col("lv")), right,
        "user_id", "ts", Seq("rv"))
    }
  }

  test("empty right side yields all-null payloads on both paths") {
    import spark.implicits._
    val left = df(Seq((1L, 5L, 10L), (2L, 6L, 20L)), "lv")
    val right = df(Seq.empty[(Long, Long, Long)], "rv")
    Seq(AsOfJoin.lastBefore(left, right, "user_id", "ts", Seq("rv")),
        AsOfJoinNative.lastBefore(left, right, "user_id", "ts", Seq("rv")))
      .foreach { out =>
        assert(out.count() == 2)
        assert(out.filter(col("asof_ts").isNotNull).count() == 0)
      }
  }
}
