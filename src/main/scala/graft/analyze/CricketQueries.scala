package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The analysis.ipynb query workload (SURVEY §2.5 A1-A12) as named
  * DataFrame transforms over the matchwise table. These are the cricket
  * twins of the star-schema queries in RelQueries (which carry the
  * DuckDB oracles); here they run against extracted fixture data in
  * ScalaTest.
  */
object CricketQueries {

  /** A2/A4/A6 — lenient date parse, year extraction, matches per year. */
  def matchesPerYear(matchwise: DataFrame): DataFrame =
    matchwise
      .withColumn("year", year(to_date(col("date"), "yyyy-MM-dd")))
      .groupBy(col("year")).agg(count(lit(1)).as("n"))
      .orderBy(col("year"))

  /** A3 — null-count profile over every column. */
  def nullProfile(matchwise: DataFrame): DataFrame =
    matchwise.select(matchwise.columns.toSeq
      .map(c => count(when(col(c).isNull, 1)).as(c)): _*)

  /** A5 — distinct union of both team columns, sorted. */
  def allTeams(matchwise: DataFrame): DataFrame =
    matchwise.select(col("team_1").as("team"))
      .union(matchwise.select(col("team_2").as("team")))
      .filter(col("team").isNotNull)
      .distinct().orderBy(col("team"))

  /** A6/A7 — matches per year for one team (either side). */
  def teamMatchesPerYear(matchwise: DataFrame, team: String): DataFrame =
    matchwise
      .filter(col("team_1") === team || col("team_2") === team)
      .withColumn("year", year(to_date(col("date"), "yyyy-MM-dd")))
      .groupBy(col("year")).agg(count(lit(1)).as("n"))
      .orderBy(col("year"))

  /** A8 — case-insensitive "no result" count and complement. */
  def noResultSplit(matchwise: DataFrame): DataFrame =
    matchwise.agg(
      count(when(lower(col("winner")) === "no result", 1)).as("no_result"),
      count(when(lower(col("winner")) =!= "no result", 1)).as("completed"))

  /** A9 — did the toss winner win, over completed matches. */
  def tossWinnerWon(matchwise: DataFrame): DataFrame =
    matchwise
      .filter(col("winner").isNotNull &&
        lower(col("winner")) =!= "no result" && lower(col("winner")) =!= "tie")
      .withColumn("toss_winner_won", col("toss_winner") === col("winner"))
      .groupBy(col("toss_winner_won")).agg(count(lit(1)).as("n"))
      .orderBy(col("toss_winner_won"))

  /** A10 — toss decision vs outcome, with readable labels. */
  def tossDecisionOutcome(matchwise: DataFrame): DataFrame =
    matchwise
      .filter(col("winner").isNotNull &&
        lower(col("winner")) =!= "no result" && lower(col("winner")) =!= "tie")
      .withColumn("outcome_label",
        when(col("toss_winner") === col("winner"), "toss winner won")
          .otherwise("toss winner lost"))
      .groupBy(col("toss_decision"), col("outcome_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("toss_decision"), col("outcome_label"))

  /** A11 — wins by runs vs wins by wickets (non-null margin counts). */
  def marginSplit(matchwise: DataFrame): DataFrame =
    matchwise.agg(
      count(col("margin_runs")).as("won_by_runs"),
      count(col("margin_wickets")).as("won_by_wickets"))

  /** A12 — toss decision distribution. */
  def tossDecisionCounts(matchwise: DataFrame): DataFrame =
    matchwise.groupBy(col("toss_decision")).agg(count(lit(1)).as("n"))
      .orderBy(col("toss_decision"))
}
