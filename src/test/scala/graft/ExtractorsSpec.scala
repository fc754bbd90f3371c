package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.extract.Extractors
import graft.model.Cricsheet

class ExtractorsSpec extends SparkSpec {

  lazy val raw = Cricsheet.read(spark, fixturesDir).cache()
  lazy val mw = Extractors.matchwise(raw).cache()
  lazy val dw = Extractors.deliverywise(raw).cache()

  private def matchRow(id: Int): Row =
    mw.filter(col("match_id") === id).collect().head

  test("matchwise basic row (f01)") {
    val r = matchRow(1001)
    assert(r.getAs[String]("date") == "2020-01-01")
    assert(r.getAs[String]("event_name") == "Fixture Cup")
    assert(r.getAs[String]("ground_name") == "Ground A")
    assert(r.getAs[String]("ground_city") == "Alphaville")
    assert(r.getAs[String]("team_1") == "Alpha")
    assert(r.getAs[String]("team_2") == "Beta")
    assert(r.getAs[String]("toss_winner") == "Alpha")
    assert(r.getAs[String]("toss_decision") == "bat")
    assert(r.getAs[Int]("team_1_total_runs") == 13)
    assert(r.getAs[Int]("team_2_total_runs") == 6)
    assert(r.getAs[String]("winner") == "Alpha")
    assert(r.getAs[Double]("margin_runs") == 7.0)
    assert(r.isNullAt(r.fieldIndex("margin_wickets")))
    assert(r.isNullAt(r.fieldIndex("winning_method")))
    assert(r.getAs[String]("player_of_the_match") == "A One")
  }

  test("matchwise totals include extras (f02)") {
    val r = matchRow(1002)
    assert(r.getAs[Int]("team_1_total_runs") == 16)
    assert(r.getAs[Int]("team_2_total_runs") == 12)
    assert(r.getAs[Double]("margin_wickets") == 4.0)
  }

  test("matchwise sparse info: absent fields are null, not errors (f03)") {
    val r = matchRow(1003)
    assert(r.isNullAt(r.fieldIndex("event_name")))
    assert(r.isNullAt(r.fieldIndex("ground_city")))
    assert(r.getAs[String]("winner") == "no result")
    assert(r.isNullAt(r.fieldIndex("margin_runs")))
    assert(r.isNullAt(r.fieldIndex("player_of_the_match")))
    assert(r.getAs[Int]("team_1_total_runs") == 1)
    // team exists in info.teams but never batted -> 0, not null
    assert(r.getAs[Int]("team_2_total_runs") == 0)
  }

  test("matchwise first date + D/L method (f04)") {
    val r = matchRow(1004)
    assert(r.getAs[String]("date") == "2020-04-04")
    assert(r.getAs[String]("winning_method") == "D/L")
    assert(r.getAs[String]("winner") == "Cold")
  }

  test("matchwise tie coalesces outcome.result (f06)") {
    val r = matchRow(1006)
    assert(r.getAs[String]("winner") == "tie")
    assert(r.getAs[Int]("team_1_total_runs") == 4)
    assert(r.getAs[Int]("team_2_total_runs") == 4)
  }

  test("deliverywise row count = total balls across fixtures") {
    // f01: 8, f02: 9, f03: 1, f04: 3, f05: 1, f06: 2
    assert(dw.count() == 24)
  }

  test("deliverywise numbering: innings 1-based, over 0-based, ball 1-based") {
    val alphaOver1 = dw.filter(col("match_id") === 1001 &&
      col("batting_team") === "Alpha" && col("over_number") === 1)
      .orderBy(col("ball_number")).collect()
    assert(alphaOver1.map(_.getAs[Int]("ball_number")).toSeq == Seq(1, 2))
    assert(alphaOver1.forall(_.getAs[Int]("innings_number") == 1))
    val beta = dw.filter(col("match_id") === 1001 && col("batting_team") === "Beta")
    assert(beta.select(min(col("over_number"))).collect().head.getInt(0) == 0)
    assert(beta.select(max(col("innings_number"))).collect().head.getInt(0) == 2)
  }

  test("deliverywise bowling team is the complement of the batting team") {
    val distinctPairs = dw.select(col("batting_team"), col("bowling_team"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(distinctPairs.contains(("Alpha", "Beta")))
    assert(distinctPairs.contains(("Beta", "Alpha")))
    assert(distinctPairs.contains(("Gamma", "Delta")))
    assert(!distinctPairs.exists(p => p._1 == p._2))
  }

  test("deliverywise extras default to 0 and split correctly (f02)") {
    val balls = dw.filter(col("match_id") === 1002 && col("batting_team") === "Gamma")
      .orderBy(col("ball_number")).collect()
    assert(balls(0).getAs[Int]("wide_runs") == 1)
    assert(balls(1).getAs[Int]("no_ball_runs") == 1)
    assert(balls(1).getAs[Int]("batsman_runs") == 2)
    assert(balls(2).getAs[Int]("leg_bye_runs") == 2)
    assert(balls(3).getAs[Int]("bye_runs") == 4)
    assert(balls(4).getAs[Int]("penalty_runs") == 5)
    assert(balls(0).getAs[Int]("penalty_runs") == 0)
  }

  test("deliverywise keeps only the first wicket and first fielder (f02)") {
    val b6 = dw.filter(col("match_id") === 1002 && col("ball_number") === 6)
      .collect().head
    assert(b6.getAs[String]("player_dismissed") == "G One")
    assert(b6.getAs[String]("dismissal_type") == "run out")
    assert(b6.getAs[String]("fielder_name") == "D Five")
  }

  test("deliverywise wicket without fielders yields null fielder (f01)") {
    val b = dw.filter(col("match_id") === 1001 && col("player_dismissed").isNotNull)
      .collect().head
    assert(b.getAs[String]("player_dismissed") == "B Three")
    assert(b.isNullAt(b.fieldIndex("fielder_name")))
  }

  test("matchwise totals tie out with deliverywise sums (invariant)") {
    val fromBalls = dw.groupBy(col("match_id"), col("batting_team"))
      .agg(sum(col("total_runs")).as("total"))
    val fromMatch = mw.select(col("match_id"), col("team_1").as("batting_team"),
        col("team_1_total_runs").cast("long").as("expected"))
      .union(mw.filter(col("team_2").isNotNull)
        .select(col("match_id"), col("team_2"), col("team_2_total_runs").cast("long")))
    val joined = fromMatch.join(fromBalls, Seq("match_id", "batting_team"), "left")
      .withColumn("total", coalesce(col("total"), lit(0L)))
    assert(joined.filter(col("total") =!= col("expected")).count() == 0)
  }
}
