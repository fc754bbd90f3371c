package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.extract.Extractors
import graft.model.Cricsheet

/** Property-based invariants (SURVEY §5.4) over randomly generated
  * Cricsheet matches: the matchwise totals always tie out with the
  * deliverywise sums, numbering is dense, and extraction is
  * deterministic. Matches are generated as JSON text and pushed through
  * the real reader so the whole path (schema, nullability, explode) is
  * under test, not just the column expressions.
  */
class PropertiesSpec extends SparkSpec {

  /** Raw-ScalaCheck sampling (the scalatest bridge isn't on the
    * classpath): draw n generated values, skipping failed samples.
    */
  private def forSamples[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val team = Gen.oneOf("Red", "Blue")

  private case class Ball(batter: Int, extras: Int)
  private def ballJson(b: Ball): String =
    s"""{"batter":"P${b.batter}","bowler":"Q","non_striker":"R",
       |"runs":{"batter":${b.batter},"extras":${b.extras},
       |"total":${b.batter + b.extras}}}""".stripMargin.replaceAll("\n", "")

  private val ballGen = for {
    r <- Gen.choose(0, 6); e <- Gen.choose(0, 2)
  } yield Ball(r, e)

  private val overGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, ballGen))

  private def inningsJson(t: String, overs: List[List[Ball]]): String = {
    val os = overs.zipWithIndex.map { case (balls, i) =>
      s"""{"over":$i,"deliveries":[${balls.map(ballJson).mkString(",")}]}"""
    }
    s"""{"team":"$t","overs":[${os.mkString(",")}]}"""
  }

  private val matchGen = for {
    t1 <- team
    t2 = if (t1 == "Red") "Blue" else "Red"
    i1 <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, overGen))
    i2 <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, overGen))
  } yield {
    val inns = inningsJson(t1, i1) +: (if (i2.nonEmpty) Seq(inningsJson(t2, i2)) else Nil)
    s"""{"info":{"dates":["2021-01-01"],"venue":"G","teams":["$t1","$t2"],
       |"toss":{"winner":"$t1","decision":"bat"},
       |"outcome":{"winner":"$t1","by":{"runs":1}}},
       |"innings":[${inns.mkString(",")}]}""".stripMargin.replaceAll("\n", "")
  }

  private def extract(matches: Seq[String]) = {
    val dir = java.nio.file.Files.createTempDirectory("prop").toString
    matches.zipWithIndex.foreach { case (m, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, s"${2000 + i}.json"), m)
    }
    val raw = Cricsheet.read(spark, dir)
    (Extractors.matchwise(raw), Extractors.deliverywise(raw))
  }

  test("team totals always tie out with per-ball sums") {
    forSamples(Gen.listOfN(3, matchGen), 5) { ms =>
      val (mw, dw) = extract(ms)
      val fromBalls = dw.groupBy(col("match_id"), col("batting_team"))
        .agg(sum(col("total_runs")).as("total"))
      val fromMatch = mw.select(col("match_id"),
          col("team_1").as("batting_team"),
          col("team_1_total_runs").cast("long").as("expected"))
        .union(mw.select(col("match_id"), col("team_2"),
          col("team_2_total_runs").cast("long")))
      val joined = fromMatch.join(fromBalls,
          Seq("match_id", "batting_team"), "left")
        .withColumn("total", coalesce(col("total"), lit(0L)))
      assert(joined.filter(col("total") =!= col("expected")).count() == 0)
    }
  }

  test("ball numbering is dense 1..n within every over") {
    forSamples(Gen.listOfN(2, matchGen), 5) { ms =>
      val (_, dw) = extract(ms)
      val byOver = dw.groupBy(col("match_id"), col("innings_number"), col("over_number"))
        .agg(count(lit(1)).as("n"), min(col("ball_number")).as("lo"),
          max(col("ball_number")).as("hi"),
          countDistinct(col("ball_number")).as("d"))
      assert(byOver.filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("d") =!= col("n")).count() == 0)
    }
  }

  test("PrefixSum equals the single-task window on random values") {
    import spark.implicits._
    val rowGen = for {
      key <- Gen.choose(0L, 500L)
      v <- Gen.choose(-1000L, 1000L) // negatives too: offsets must still add up
    } yield (key, v)
    forSamples(Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, rowGen)), 5) { rows =>
      // unique order key: (v, idx) dedup via index column
      val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "k", "v")
      val viaOp = graft.operators.PrefixSum
        .withRunningSum(df, Seq(col("k"), col("id")), "v", "rs")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("k"), col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val viaWindow = df.withColumn("rs",
        coalesce(sum(col("v")).over(w), lit(0L)).cast("long"))
      assert(viaOp.exceptAll(viaWindow).count() == 0)
      assert(viaWindow.exceptAll(viaOp).count() == 0)
      ()
    }
  }

  test("withRunningSums (combined) equals composed single ops + withSeq") {
    import spark.implicits._
    val rowGen = for {
      key <- Gen.choose(0L, 500L)
      v <- Gen.choose(-1000L, 1000L)
      u <- Gen.choose(-1000L, 1000L)
    } yield (key, v, u)
    forSamples(Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, rowGen)), 5) { rows =>
      val df = rows.zipWithIndex.map { case ((k, v, u), i) => (i.toLong, k, v, u) }
        .toDF("id", "k", "v", "u")
      val order = Seq(col("k"), col("id"))
      val combined = graft.operators.PrefixSum
        .withRunningSums(df, order, Seq("v" -> "rs", "u" -> "ru"), Some("i"))
      val composed = graft.operators.SeqNumber.withSeq(
        graft.operators.PrefixSum.withRunningSum(
          graft.operators.PrefixSum.withRunningSum(df, order, "v", "rs"),
          order, "u", "ru"),
        order, "i")
      assert(combined.exceptAll(composed).count() == 0)
      assert(composed.exceptAll(combined).count() == 0)
      ()
    }
  }

  test("withRunningSums on empty input yields empty output, not a crash") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(graft.operators.PrefixSum
      .withRunningSums(df, Seq(col("id")), Seq("v" -> "rs"), Some("i"))
      .count() == 0)
  }

  test("PrefixSum on empty input yields empty output, not a crash") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(graft.operators.PrefixSum
      .withRunningSum(df, Seq(col("id")), "v", "rs").count() == 0)
    assert(graft.operators.PrefixSum
      .withRunningMax(df, Seq(col("id")), "v", "rm").count() == 0)
  }

  test("withRunningMax equals the single-task window; first row null") {
    import spark.implicits._
    val rowGen = for {
      key <- Gen.choose(0L, 500L)
      v <- Gen.choose(-1000L, 1000L)
    } yield (key, v)
    forSamples(Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, rowGen)), 5) { rows =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("id", "k", "v")
      val viaOp = graft.operators.PrefixSum
        .withRunningMax(df, Seq(col("k"), col("id")), "v", "rm")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("k"), col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val viaWindow = df.withColumn("rm", max(col("v")).over(w).cast("long"))
      assert(viaOp.exceptAll(viaWindow).count() == 0)
      assert(viaWindow.exceptAll(viaOp).count() == 0)
      // the globally first row has no predecessor: null, not a sentinel
      assert(viaOp.orderBy(col("k"), col("id")).limit(1)
        .collect()(0).isNullAt(3))
      ()
    }
  }

  test("extraction is deterministic (same input, same rows)") {
    forSamples(Gen.listOfN(2, matchGen), 3) { ms =>
      val (mw1, _) = extract(ms)
      val (mw2, _) = extract(ms)
      assert(mw1.exceptAll(mw2).count() == 0 && mw2.exceptAll(mw1).count() == 0)
    }
  }
}
