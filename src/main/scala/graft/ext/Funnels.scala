package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.PlanCapture.CheckpointOps

/** Ordered event-funnel analysis over an event stream — the product
  * analytics staple (view -> click -> purchase within a window) that is
  * also the shape of any multi-stage pipeline-latency audit. A user
  * converts stage i when they have an event of stage i's type STRICTLY
  * after their stage-(i-1) conversion time and within `windowMinutes`
  * of it; the conversion time is the EARLIEST such event (the
  * deterministic greedy chaining every funnel tool uses).
  */
object Funnels {

  /** Per-stage conversion counts for a fixed stage-type sequence.
    *
    * Shape at scale: one pass per stage — filter to the stage's type,
    * equi-join on user_id against the previous stage's conversion
    * times (both sides hash-partitioned on user_id; AQE broadcasts the
    * shrinking conversion side as the funnel narrows), groupBy(user)
    * MIN. No windows, no sort of the full stream, no per-user event
    * arrays — a user's whole history never materializes on one row.
    * Timestamps compare as epoch microseconds (exact integers).
    *
    * Output: one row per stage, (stage, event_type, n_users,
    * conv_from_prev, conv_from_first) — conversion fractions are
    * single exact-integer divisions (null when the denominator is 0).
    */
  def eventFunnel(events: DataFrame, stages: Seq[String],
                  windowMinutes: Int): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    require(windowMinutes > 0, "windowMinutes > 0")
    val winUs = windowMinutes * 60L * 1000000L
    val ev = graft.core.Tables.spread(events)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    def stageTimes(prev: Option[DataFrame], tpe: String): DataFrame = {
      val mine = ev.filter(col("event_type") === tpe)
      prev match {
        case None =>
          mine.groupBy(col("user_id")).agg(min(col("tus")).as("ct"))
        case Some(p) =>
          mine.join(p.select(col("user_id"), col("ct").as("prev_ct")),
              "user_id")
            .filter(col("tus") > col("prev_ct") &&
              col("tus") <= col("prev_ct") + winUs)
            .groupBy(col("user_id")).agg(min(col("tus")).as("ct"))
      }
    }
    val counts: Seq[(Int, String, DataFrame)] = stages.zipWithIndex
      .foldLeft((Option.empty[DataFrame],
        List.empty[(Int, String, DataFrame)])) {
        case ((prev, acc), (tpe, i)) =>
          // each stage's conversion table feeds TWO consumers (its own
          // count and the next stage's join): materialize once
          val st = stageTimes(prev, tpe).cpGuard()
          val cnt = st.agg(count(lit(1)).cast("long").as("n_users"))
            .select(lit(i + 1).as("stage"), lit(tpe).as("event_type"),
              col("n_users"))
          (Some(st), acc :+ ((i + 1, tpe, cnt)))
      }._2
    val all = counts.map(_._3).reduce(_.unionAll(_))
    // prev-stage attach via a stage+1 equi-join over the |stages|-row
    // frame — no unpartitioned window anywhere
    val prev = all.select((col("stage") + 1).as("stage"),
      col("n_users").as("prev_n"))
    val first = counts.head._3.select(col("n_users").as("n_first"))
    all.join(prev, Seq("stage"), "left")
      .crossJoin(broadcast(first))
      .select(col("stage"), col("event_type"), col("n_users"),
        when(col("prev_n") > 0,
          col("n_users").cast("double") / col("prev_n").cast("double"))
          .as("conv_from_prev"),
        when(col("n_first") > 0,
          col("n_users").cast("double") / col("n_first").cast("double"))
          .as("conv_from_first"))
      .orderBy(col("stage"))
  }

  /** Retention cohort matrix: users cohorted by their FIRST active
    * week (integer weeks since epoch — `epoch_us div week_us`, exact
    * and engine-neutral, no calendar-week-start conventions), then for
    * each (cohort, periods-since-cohort) the distinct active users and
    * the retention fraction vs the cohort's own week 0. The
    * product-health matrix every events pipeline reports, and the same
    * shape as a training-data "source freshness" decay audit.
    *
    * Shape: one user-keyed min-aggregate (cohort assignment), one
    * user-keyed equi-join back, one distinct + groupBy — all
    * partial-aggregable; the week-0 base attaches by a cohort-keyed
    * equi-join (cohorts are few; AQE broadcasts). Output: (cohort_wk,
    * period, n_users, retention) ordered.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val ev = graft.core.Tables.spread(events)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $weekUs").as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val act = ev.join(cohort, "user_id")
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("period"),
        col("user_id"))
      .distinct()
    val counts = act.groupBy(col("cohort_wk"), col("period"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .cpGuard() // feeds itself (week-0 base) — one materialization
    val base = counts.filter(col("period") === 0)
      .select(col("cohort_wk"), col("n_users").as("n0"))
    counts.join(base, Seq("cohort_wk"))
      .select(col("cohort_wk"), col("period"), col("n_users"),
        (col("n_users").cast("double") / col("n0").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_wk"), col("period"))
  }

  /** Watermark late-data audit: replay the stream in ARRIVAL order and
    * count, per event-time hour, the events that a watermark of
    * `delayMinutes` would have dropped — an event is late when its
    * event time sits more than the delay behind the high-water mark
    * (the max event time among everything that ARRIVED before it).
    * This is the measurement that sizes a Structured Streaming
    * `withWatermark` before deployment: too tight silently drops the
    * tail this audit quantifies, too loose holds state.
    *
    * The high-water mark is [[graft.operators.PrefixSum.withRunningMax]]
    * over the arrival order — the distributed exclusive running max, no
    * single-task global window. `arrival` is whatever column records
    * ingest order (a kafka offset, an ingest sequence; ties broken by
    * event_id). Output: (hour, n, n_late, late_frac) by event-time
    * hour, exact integers + one division.
    */
  def watermarkLateAudit(events: DataFrame,
                         arrival: org.apache.spark.sql.Column,
                         delayMinutes: Int): DataFrame = {
    require(delayMinutes >= 0, "delayMinutes >= 0")
    val dUs = delayMinutes * 60L * 1000000L
    val ev = graft.core.Tables.spread(events)
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        arrival.as("arr"))
    val hw = graft.operators.PrefixSum.withRunningMax(ev,
      Seq(col("arr"), col("event_id")), "tus", "hw")
    hw
      .select(expr("CAST(tus div 3600000000 AS BIGINT)").as("hour"),
        (col("hw").isNotNull && col("tus") < col("hw") - dUs).as("late"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(when(col("late"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_late"))
      .select(col("hour"), col("n"), col("n_late"),
        (col("n_late").cast("double") / col("n").cast("double"))
          .as("late_frac"))
      .orderBy(col("hour"))
  }

  /** Kaplan-Meier churn survival curve (Kaplan & Meier 1958) with
    * right-censoring — the actuarial "how long do users stay active"
    * estimate product analytics runs next to [[retentionCohorts]].
    * A user's lifetime is last event − first event in WHOLE HOURS
    * (exact integer division of the microsecond gap); a user has
    * CHURNED (the "event" is observed) when their last event is at
    * least `censorDays` before the corpus's last timestamp, otherwise
    * they are right-censored at their lifetime — still at risk up to
    * it, but never a death. S(t) = Π_{t' <= t} (1 − d_t'/n_t') over
    * death times ascending, with the standard convention that
    * same-time censored users count in that time's risk set.
    *
    * Exactness: lifetimes, risk counts and death counts are exact
    * BIGINTs; each factor is ONE IEEE division subtracted from 1.0 and
    * the product folds ascending in one fixed order, so the doubles
    * replay bit-for-bit in any engine folding the same sequence.
    *
    * Scale shape: two partial-aggregable groupBys (per-user min/max,
    * then per-lifetime counts) reduce the corpus to one row per
    * DISTINCT LIFETIME HOUR — bounded by the observation window in
    * hours (720 here), NOT by user or event count — and the survival
    * fold runs over that bounded table driver-side (the c23/c25
    * bounded-collect contract; a year-long window is still only 8.8k
    * rows). Output: (t_hours, n_risk, d_churned, survival) at death
    * times, ascending.
    */
  def kaplanMeier(events: DataFrame, censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, "censorDays >= 0")
    val spark = events.sparkSession
    val u = graft.core.Tables.spread(events)
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .cpGuard() // feeds the 1-row max AND the lifetime histogram
    val maxRow = u.agg(max(col("last_us"))).collect()
    import spark.implicits._
    if (maxRow.isEmpty || maxRow(0).isNullAt(0))
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("t_hours", "n_risk", "d_churned", "survival")
    val cutoff = maxRow(0).getLong(0) - censorDays.toLong * 86400000000L
    val grouped = u
      .select(expr("(last_us - first_us) div 3600000000").as("dur_h"),
        (col("last_us") <= cutoff).as("churn"))
      .groupBy(col("dur_h"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("churn"), 1L).otherwise(0L)).as("n_churn"))
      .orderBy(col("dur_h"))
      .collect() // bounded: one row per distinct lifetime hour
    var atRisk = grouped.map(_.getLong(1)).sum
    var s = 1.0
    val out = Vector.newBuilder[(Long, Long, Long, Double)]
    grouped.foreach { r =>
      val (t, nAll, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (d > 0) {
        s = s * (1.0 - d.toDouble / atRisk.toDouble)
        out += ((t, atRisk, d, s))
      }
      atRisk -= nAll
    }
    out.result().toDF("t_hours", "n_risk", "d_churned", "survival")
      .orderBy(col("t_hours"))
  }
}
