package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON -> relational extraction, the heart of the reference pipeline.
  *
  * Both extractors are pure DataFrame -> DataFrame projections off one
  * shared Cricsheet scan (the reference reads each S3 object twice, once
  * per Lambda — we deliberately don't). No UDFs, no custom generators:
  * the 3-level flatten is chained posexplode (built-in Generator) and
  * the per-team totals are higher-order-function aggregates, all inside
  * whole-stage codegen.
  */
object Extractors {

  /** Sum of runs.total over every delivery bowled while `team` batted
    * (extract_matchwise…:85-98): 0 when the team never batted.
    * Includes any extra innings (super overs) for that team, matching
    * the reference's unconditional per-innings loop.
    */
  private def teamTotal(team: Column): Column =
    aggregate(
      filter(col("innings"), i => i.getField("team") === team),
      lit(0L),
      (acc, inn) => acc + aggregate(
        flatten(transform(inn.getField("overs"), o => o.getField("deliveries"))),
        lit(0L),
        (a, d) => a + coalesce(d.getField("runs").getField("total"), lit(0L))))

  /** One row per match (extract_matchwise…:58-76). `match_number` is
    * assigned later at publish time (convert_mongo…:42-44), not here.
    */
  def matchwise(raw: DataFrame): DataFrame = {
    val teams = col("info.teams")
    raw.select(
      col("match_id"),
      element_at(col("info.dates"), 1).as("date"),
      col("info.event.name").as("event_name"),
      col("info.venue").as("ground_name"),
      col("info.city").as("ground_city"),
      element_at(teams, 1).as("team_1"),
      when(size(teams) > 1, element_at(teams, 2)).as("team_2"),
      col("info.toss.winner").as("toss_winner"),
      col("info.toss.decision").as("toss_decision"),
      // coalesce: a match with no innings key at all still reports 0,
      // like the reference's json_data.get('innings', []) default
      coalesce(teamTotal(element_at(teams, 1)), lit(0L))
        .cast("int").as("team_1_total_runs"),
      when(size(teams) > 1, coalesce(teamTotal(element_at(teams, 2)), lit(0L)))
        .cast("int").as("team_2_total_runs"),
      coalesce(col("info.outcome.winner"), col("info.outcome.result")).as("winner"),
      col("info.outcome.by.runs").cast("double").as("margin_runs"),
      col("info.outcome.by.wickets").cast("double").as("margin_wickets"),
      col("info.outcome.method").as("winning_method"),
      element_at(col("info.player_of_match"), 1).as("player_of_the_match"))
  }

  /** One row per ball via chained posexplode (extract_deliverywise…:96-202):
    * innings_number 1-based (enumerate start=1, :102), over_number 0-based
    * straight from the JSON "over" field (:133), ball_number 1-based per
    * over (:136). Only the first wicket and first fielder are kept
    * (:176-179). The reference's per-ball pd.concat (quadratic) simply
    * disappears — the generator emits all rows in one pass.
    */
  def deliverywise(raw: DataFrame): DataFrame = {
    val innings = raw.select(
      col("match_id"),
      col("info.teams").as("teams"),
      posexplode(col("innings")).as(Seq("inn_idx", "inning")))
    val overs = innings.select(
      col("match_id"),
      (col("inn_idx") + 1).cast("int").as("innings_number"),
      col("inning.team").as("batting_team"),
      element_at(filter(col("teams"), t => t =!= col("inning.team")), 1)
        .as("bowling_team"),
      explode(col("inning.overs")).as("over"))
    val balls = overs.select(
      col("match_id"), col("innings_number"),
      col("batting_team"), col("bowling_team"),
      col("over.over").cast("int").as("over_number"),
      posexplode(col("over.deliveries")).as(Seq("ball_idx", "del")))
    val w = element_at(col("del.wickets"), 1)
    balls.select(
      col("match_id"), col("innings_number"),
      col("batting_team"), col("bowling_team"), col("over_number"),
      (col("ball_idx") + 1).cast("int").as("ball_number"),
      col("del.batter").as("batter"),
      col("del.bowler").as("bowler"),
      col("del.non_striker").as("non_striker"),
      coalesce(col("del.extras.wides"), lit(0L)).cast("int").as("wide_runs"),
      coalesce(col("del.extras.legbyes"), lit(0L)).cast("int").as("leg_bye_runs"),
      coalesce(col("del.extras.byes"), lit(0L)).cast("int").as("bye_runs"),
      coalesce(col("del.extras.noballs"), lit(0L)).cast("int").as("no_ball_runs"),
      coalesce(col("del.extras.penalty"), lit(0L)).cast("int").as("penalty_runs"),
      coalesce(col("del.runs.batter"), lit(0L)).cast("int").as("batsman_runs"),
      coalesce(col("del.runs.extras"), lit(0L)).cast("int").as("extra_runs"),
      coalesce(col("del.runs.total"), lit(0L)).cast("int").as("total_runs"),
      w.getField("player_out").as("player_dismissed"),
      w.getField("kind").as("dismissal_type"),
      element_at(w.getField("fielders"), 1).getField("name").as("fielder_name"))
  }
}
