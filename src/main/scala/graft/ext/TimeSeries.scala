package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.PlanCapture.CheckpointOps

/** Per-entity time-series operators over the event stream: exponential
  * moving averages, time-weighted averages, and OHLC bar aggregation —
  * the monitoring/featurization workload a training-data pipeline runs
  * over interaction logs (reference scope: the analysis notebook's
  * per-match aggregations, `analysis.ipynb`; here generalized to
  * event-time series).
  *
  * Determinism discipline (see README "Correctness model"): recursive
  * definitions (EMA) run as a per-key ORDERED LEFT FOLD in double —
  * the exact IEEE operation sequence DuckDB's `list_reduce` performs —
  * and weighted sums run in exact decimal with integer microsecond
  * weights, divided once at the end. Scale shape: one shuffle per
  * operator (the groupBy/window key); per-key state is the key's own
  * row count, never the corpus.
  */
object TimeSeries {

  /** Exponential moving average of `value` per user, events ordered by
    * (ts, event_id): ema_0 = x_0; ema_i = ema_{i-1} + alpha*(x_i -
    * ema_{i-1}). The fold runs inside ONE hash aggregation
    * (collect_list + array_sort + `aggregate` HOF) — no window
    * pass, no per-row recursion; alpha must be a dyadic rational
    * (0.25 here) so the literal converts exactly in both engines.
    */
  def ema(events: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    events
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        col("ts"), col("event_id"), col("value")))).as("seq"))
      .select(
        col("user_id"),
        size(col("seq")).cast("long").as("n"),
        aggregate(
          slice(col("seq.value"), lit(2), size(col("seq")) - 1),
          element_at(col("seq.value"), 1),
          (acc: Column, x: Column) => acc + lit(alpha) * (x - acc))
          .as("ema"))
      .orderBy(col("user_id"))
  }

  /** Time-weighted average of `value` per user: each event's value
    * holds until the next event; weight = interval length in whole
    * seconds (integer division of the microsecond gap — sub-second
    * slivers carry no weight). The weighted sum stays a BIGINT in
    * cents*seconds — bounded by 1e4 cents x ~2.6e6 s per user, far
    * below 2^53, so BOTH engines convert it to double exactly (a
    * DECIMAL-typed sum whose storage exceeds 2^53 double-rounds in
    * DuckDB's decimal->double cast and misses by an ulp). One final
    * IEEE division. The last event of each user has no successor and
    * contributes no interval.
    */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      // both operands are non-negative, so truncating div == floor
      .withColumn("dur_s", expr("(next_us - us) div 1000000"))
      // exact integer cents: through DECIMAL(18,2), never value*100
      // in floating point (6.55*100 is not 655 in IEEE)
      .withColumn("cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dur_s")).as("total_s"),
        sum(col("cents") * col("dur_s")).as("wv_cents_s"))
      .filter(col("total_s") > 0)
      .select(col("user_id"), col("n_intervals"), col("total_s"),
        (col("wv_cents_s").cast("double") /
          (col("total_s") * 100).cast("double")).as("twa"))
      .orderBy(col("user_id"))
  }

  /** Seasonal robust-outlier profile: per hour-of-day, the lower
    * median of the value (in exact cents), the median absolute
    * deviation (MAD), and how many events sit more than `madK` MADs
    * from their hour's median — w13's robust-outlier discipline with
    * a seasonal (time-of-day) baseline, so a value that is normal at
    * peak hours but absurd at 4am is caught. Medians are RANK-selected
    * (row_number at rank (n+1)/2 — the q36 discipline, no collect, no
    * interpolation); everything stays integer cents. Two window
    * passes + two 24-row broadcast joins; at any scale the windows
    * partition by the 24 hour keys, so a skewed hour is the natural
    * AQE-skew candidate.
    */
  def seasonalOutliers(events: DataFrame, madK: Int = 3): DataFrame = {
    val ev = events.select(col("event_id"),
      hour(col("ts")).as("hod"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    def lowerMedian(df: DataFrame, valueCol: String,
                    out: String): DataFrame = {
      val w = Window.partitionBy(col("hod"))
        .orderBy(col(valueCol), col("event_id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("hod"))))
        .filter(col("rn") === floor((col("cnt") + 1) / 2))
        .select(col("hod"), col(valueCol).as(out))
    }
    val med = lowerMedian(ev, "cents", "med_cents")
    // referenced by the MAD pass AND the final flag join — the
    // multi-reference rule
    val withMed = ev.join(broadcast(med), "hod")
      .withColumn("adev", abs(col("cents") - col("med_cents")))
      .cpGuard()
    val mad = lowerMedian(withMed, "adev", "mad_cents")
    withMed.join(broadcast(mad), "hod")
      .groupBy(col("hod"))
      .agg(count(lit(1)).as("n"),
        max(col("med_cents")).as("med_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("adev") > lit(madK.toLong) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("hod"))
  }

  /** One-sided CUSUM change-point statistic per user (Page 1954):
    * s_0 = 0; s_i = max(0, s_{i-1} + x_i - k) over events in
    * (ts, event_id) order, alarm when s_i > h — the classic
    * upward-shift detector a pipeline runs over per-source volume or
    * quality series. `kCents`/`hCents` are exact integer cents
    * (values are 2-decimal), so everything is BIGINT arithmetic — no
    * float drift, bit-reproducible anywhere.
    *
    * The clamp recursion is NOT computed recursively: by the standard
    * prefix identity, s_i = P_i - min(0, min_{j<=i} P_j) with
    * P_i = sum_{t<=i}(x_t - k) — so the whole statistic is two
    * same-spec window passes (running sum + running min) and one
    * groupBy. No per-user collect, no fold state: the formulation
    * that survives million-event keys. (It also sidesteps a DuckDB
    * 1.0 list_reduce miscompute on struct accumulators with repeated
    * subexpressions, which the fold formulation trips.)
    */
  def cusum(events: DataFrame, kCents: Long, hCents: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("p", sum(col("cents") - lit(kCents)).over(w))
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(w)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("s") > lit(hCents), 1L).otherwise(0L))
          .as("n_alarms"),
        ((sum(col("cents")) - count(lit(1)) * lit(kCents)) -
          least(lit(0L), min(col("p")))).as("final_cusum_cents"))
      .orderBy(col("user_id"))
  }

  /** Autocorrelation function per user at lags 1..`maxLag` over
    * `value` ordered by (ts, event_id) — the seasonality/persistence
    * fingerprint (a near-1 lag-k ACF says the series repeats with
    * period k; curation uses it next to [[gapStats]] to spot scripted
    * traffic). r_k = Σ(x_i−m)(x_{i+k}−m) / Σ(x_i−m)², computed
    * EXACTLY in integers via the deviation identity d_i = n·c_i − S
    * (cents): the 1/n factors cancel in the ratio, so no mean division
    * ever happens. Output is floor(r_k·1024) by portable floored
    * division ((q − pmod(q,den)) div den — exact divisibility makes
    * truncation = floor in both engines; DuckDB's HUGEINT promotion
    * can't disturb integer identities). Envelope: |d|≤n·maxCents,
    * Σd·d ≤ n³·maxCents² — at n=99, cents≤56021 that is 3.1e15, and
    * ×1024 stays under 2^63 (enforced).
    *
    * Scale shape: ONE shuffle on user_id serves the window pass and
    * the groupBy (same key); all lags come from ONE WindowExec (shared
    * frame spec) and unpivot AFTER aggregation via stack — per-lag
    * work never re-shuffles. Per-user state is that user's rows.
    */
  def acf(events: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, s"maxLag $maxLag out of range")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val dd = events
      .withColumn("cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(full))
      .withColumn("s", sum(col("cents")).over(full))
      .withColumn("d", col("n") * col("cents") - col("s"))
    val led = dd.select(
      Seq(col("user_id"), col("n"), col("d")) ++
        (1 to maxLag).map(k => lead(col("d"), k).over(w).as(s"d$k")): _*)
    val lagCols = (1 to maxLag).flatMap { k =>
      Seq(sum(col("d") * col(s"d$k")).as(s"num$k"),
        count(col(s"d$k")).as(s"np$k"))
    }
    val aggAll = Seq(max(col("n")).as("n"),
      sum(col("d") * col("d")).as("den")) ++ lagCols
    val agged = led.groupBy(col("user_id"))
      .agg(aggAll.head, aggAll.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(k => s"$k, num$k, np$k").mkString(", ")
    agged
      .select(col("user_id"), col("n"), col("den"),
        expr(s"stack($maxLag, $stackArgs) AS (lag, num, n_pairs)"))
      .filter(col("den") > 0 && col("n_pairs") > 0)
      .withColumn("q", col("num") * lit(1024L))
      .withColumn("acf_q",
        expr("(q - pmod(q, den)) div den").cast("long"))
      .select(col("user_id"), col("lag").cast("int").as("lag"),
        col("n"), col("n_pairs"), col("acf_q"))
      .orderBy(col("user_id"), col("lag"))
  }

  /** Inter-arrival gap profile per user: count/min/max/sum/mean and
    * the lower median of the microsecond gaps between consecutive
    * events — the cadence fingerprint curation uses for bot/scripted-
    * traffic detection (machine cadence: tiny, near-constant gaps).
    * All integers except the mean (one IEEE division); the median is
    * RANK-selected from the per-user sorted gap list (engines'
    * percentile interpolation differs in the last ulp; a rank pick
    * cannot). Per-user state = that user's gaps, bounded.
    */
  def gapStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("gap_us", col("next_us") - col("us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"),
        element_at(array_sort(collect_list(col("gap_us"))),
          floor((count(lit(1)) + 1) / 2).cast("int")).as("p50_gap_us"))
      .withColumn("mean_gap_us",
        col("sum_gap_us").cast("double") / col("n_gaps").cast("double"))
      .orderBy(col("user_id"))
  }

  /** Inter-arrival BURSTINESS per user: the squared coefficient of
    * variation of the gap series, CV² = (n·Σg² − S²)/S² — the
    * dimensionless cadence fingerprint [[gapStats]]' location numbers
    * don't capture: CV² = 1 for a Poisson (human-ish) arrival process,
    * → 0 for metronome-regular automation, > 1 for bursty
    * scrape-then-sleep patterns.
    *
    * Exactness: moments and the ratio in DECIMAL(38,0) — a gap SUM
    * squared is ~10²⁵ at one user-month of microseconds, far past
    * BIGINT, so the exact integer output is floor-ppm via integral
    * `div` (the q59 lift discipline) and the double rides from the
    * same decimals; both guarded by S > 0 (all-identical timestamps
    * degrade to NULL, never a divide-by-zero). One partitioned window
    * pass + one partial-aggregable groupBy.
    *
    * Output: (user_id, n_gaps, cv2_ppm, cv2), user ascending.
    */
  def gapBurstiness(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .withColumn("g", (col("next_us") - col("us")).cast(d38))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("s"),
        sum(col("g") * col("g")).as("s2"))
      .select(col("user_id"), col("n").as("n_gaps"),
        when(col("s") > 0,
          expr("CAST((n * s2 - s * s) * 1000000 div (s * s) AS BIGINT)"))
          .as("cv2_ppm"),
        when(col("s") > 0,
          (col("n") * col("s2") - col("s") * col("s")).cast("double")
            / (col("s") * col("s")).cast("double")).as("cv2"))
      .orderBy(col("user_id"))
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the value
    * distributions before and after `cutTs` — the raw-value drift test
    * next to the binned TV compare (w19 / StreamDrift): KS works on
    * the empirical CDFs directly, so it catches shifts a coarse
    * histogram hides. D = max_x |F_a(x) − F_b(x)| is an exact rational
    * with denominator N_a·N_b: computed as max |ca(x)·N_b − cb(x)·N_a|
    * over the distinct pooled values in cross-multiplied BIGINTs, ONE
    * IEEE division at the read edge. (The p-value needs exp() — libm —
    * so the statistic and its exact numerator are the outputs; the
    * alert threshold on D is the deployment contract anyway.)
    *
    * Scale shape: one partial-aggregable groupBy(cents) collapses the
    * stream to its distinct values; the two cumulative counts are
    * range-partitioned [[PrefixSum]] passes (NO unpartitioned window);
    * totals attach as a 1-row broadcast. Envelope: ca·N_b ≤ N_a·N_b
    * < 2^62 up to ~2^31 rows a side.
    */
  def ksTest(events: DataFrame, cutTs: String): DataFrame = {
    val b = events.select(
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
      (col("ts") < expr(cutTs)).as("ha"))
    val per = b.groupBy(col("cents")).agg(
      sum(when(col("ha"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("ha"), 1L).otherwise(0L)).as("nb"))
    // both cumulative counts in ONE range-partition + sort pass (they
    // share the cents order; chaining two withRunningSum calls paid
    // the pipeline twice)
    val cum = graft.operators.PrefixSum.withRunningSums(
      per, Seq(col("cents")), Seq("na" -> "ca_ex", "nb" -> "cb_ex"))
      .withColumn("ca", col("ca_ex") + col("na"))
      .withColumn("cb", col("cb_ex") + col("nb"))
    val tot = per.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    cum.crossJoin(broadcast(tot))
      .select(abs(col("ca") * col("tb") - col("cb") * col("ta")).as("dnum"),
        col("ta"), col("tb"))
      .groupBy(col("ta").as("n_a"), col("tb").as("n_b"))
      .agg(max(col("dnum")).as("ks_num"))
      .select(col("n_a"), col("n_b"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("ks"))
  }

  /** Theil–Sen robust trend estimator per user: the lower median of
    * all pairwise slopes (c_j−c_i)/(t_j−t_i) over strictly-earlier
    * pairs, in integer cents-per-hour via portable floored division
    * (q = Δcents·3.6e9 µs/h; floor(q/Δt) = (q − pmod(q,Δt)) div Δt —
    * exact divisibility makes truncation = floor in both engines).
    * Up to 29.3% contaminated points cannot move the estimate — the
    * robust alternative to the OLS slope (c11 length regression), and
    * what you fit when event values carry outliers/bot spikes. Median
    * is RANK-selected (q36 discipline), never interpolated.
    *
    * Scale shape: the pair join is a per-user self-join — shuffle-hash
    * on user_id, pair count bounded by the per-key row count squared
    * (n≤99 here → ≤4.9k pairs/user; at 100 TB you'd window or sample
    * long-lived keys first, the standard Theil–Sen-on-windows cut).
    * Envelope: |Δcents|·3.6e9 ≤ 2.1e14, far inside Long.
    */
  def theilSen(events: DataFrame): DataFrame = {
    val us = events.select(col("user_id"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val a = us.toDF("user_id", "us_a", "eid_a", "c_a")
    val b = us.toDF("user_id", "us_b", "eid_b", "c_b")
    val pairs = a.join(b.hint("shuffle_hash"), Seq("user_id"))
      .filter(col("us_a") < col("us_b"))
      .withColumn("q", (col("c_b") - col("c_a")) * lit(3600000000L))
      .withColumn("dt", col("us_b") - col("us_a"))
      .withColumn("slope_cph",
        expr("(q - pmod(q, dt)) div dt").cast("long"))
    pairs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("slope_cph")).as("min_slope"),
        max(col("slope_cph")).as("max_slope"),
        element_at(array_sort(collect_list(col("slope_cph"))),
          floor((count(lit(1)) + 1) / 2).cast("int")).as("sen_slope_cph"))
      .orderBy(col("user_id"))
  }

  /** OHLC bars: per (user, hour) open/high/low/close of `value` plus
    * exact-decimal volume. Open/close are first/last in the total
    * order (ts, event_id) — computed with one window pass whose frame
    * is the whole partition, then collapsed by the groupBy (the values
    * are constant within a bar, so max() just projects them).
    */
  def ohlc(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("open_", first(col("value")).over(w))
      .withColumn("close_", last(col("value")).over(full))
      .groupBy(col("user_id"), col("hour"))
      .agg(
        max(col("open_")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(col("close_")).as("close"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("volume"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Holt's linear-trend smoother (double exponential smoothing) per
    * user — [[ema]]'s level recursion plus a trend component, so a
    * steadily climbing metric forecasts AHEAD of its last level:
    *   l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
    *   b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
    * with l_0 = x_0, b_0 = 0 (well-defined for 1-event users).
    *
    * Exactness: alpha = 1/4 and beta = 1/2 are dyadic and the state is
    * BIGINT cents<<20, so each step is integer multiply-add plus an
    * ARITHMETIC RIGHT SHIFT — floor division by 4/2 exactly, including
    * negative trends (Spark's `shiftright` and DuckDB's `>>` are both
    * two's-complement arithmetic shifts; a `div`/`//` here would
    * truncate toward zero and diverge on the first negative b). The
    * oracle replays the identical integer recurrence as a per-user
    * recursive CTE — NOT a list_reduce fold: DuckDB 1.0's list_reduce
    * miscomputes struct accumulators with repeated subexpressions.
    * Envelope: |cents| <= ~1e5 so |state| <~ 2^38; 3*(l+b) <~ 2^40 —
    * forty-plus bits of headroom in the BIGINT.
    *
    * Scale shape: ONE hash aggregation (sorted collect + aggregate
    * HOF), the [[ema]] contract — per-key state is that key's own row
    * count, never the corpus; no window pass, no per-row shuffle.
    * Output doubles are single IEEE divisions of exact integers.
    */
  def holt(events: DataFrame): DataFrame = {
    val sc20 = 1048576L            // 2^20 state scale
    val outDiv = 104857600.0       // 2^20 * 100 (cents) per unit
    val ev = events.select(col("user_id"), col("ts"), col("event_id"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    ev.groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        col("ts"), col("event_id"), col("cents")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n"),
        aggregate(
          slice(col("seq.cents"), lit(2), size(col("seq")) - 1),
          struct((element_at(col("seq.cents"), 1) * sc20).as("l"),
            lit(0L).as("b")),
          (acc: Column, x: Column) => {
            val lNew = shiftright(
              x * sc20 + lit(3L) * (acc("l") + acc("b")), 2)
            struct(lNew.as("l"),
              shiftright(lNew - acc("l") + acc("b"), 1).as("b"))
          }).as("st"))
      .select(col("user_id"), col("n"),
        (col("st.l").cast("double") / outDiv).as("level"),
        (col("st.b").cast("double") / outDiv).as("trend"),
        ((col("st.l") + lit(4L) * col("st.b")).cast("double") / outDiv)
          .as("forecast4"))
      .orderBy(col("user_id"))
  }

  /** Additive seasonal decomposition of the corpus-level hourly load
    * series (classical decomposition; the moving-average core of STL
    * without loess): total_cents(h) = trend + seasonal + residual,
    * where trend is the CENTERED 25-HOUR moving average (spanning one
    * full day, so the daily cycle averages out of it), seasonal is the
    * hour-of-day mean of the detrended series, and the residual is
    * what monitoring should actually alarm on — [[seasonalOutliers]]
    * flags points against a static hour-of-day baseline, this one
    * first removes multi-day drift so a slow ramp doesn't masquerade
    * as seasonal change.
    *
    * Exactness: hourly totals are exact BIGINT cents; the moving sum
    * is exact (sum25, n25); detrended values are kept CROSS-MULTIPLIED
    * (total·25 − sum25 — never total − sum25/25 in floats), so the
    * seasonal means are exact integer ratios; the only doubles are
    * three fixed-order single divisions at the read edge. Hours with
    * an incomplete 25-hour window are excluded (the classical
    * convention — their trend is undefined).
    *
    * Scale shape: the corpus collapses to one row per hour (partial-
    * aggregable groupBy); the moving window is an explode of 25
    * offsets + a second groupBy on the hour key — NO unpartitioned
    * window, no sort; everything downstream runs on the bounded
    * hourly table (720 rows/month; a decade is 88k).
    *
    * Output: (h, total_cents, trend, seasonal, resid) in cents,
    * epoch-hours ascending.
    */
  def seasonalDecompose(events: DataFrame, halfWin: Int = 12): DataFrame = {
    require(halfWin >= 1, "halfWin >= 1")
    val win = 2 * halfWin + 1
    val hourly = graft.core.Tables.spread(events)
      .select(expr("unix_micros(ts) div 3600000000").as("h"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("h")).agg(sum(col("cents")).as("total"))
      .cpGuard() // feeds the offset explode AND the final join
    val ag = hourly
      .select(explode(sequence(lit(-halfWin), lit(halfWin))).as("o"),
        col("h"), col("total"))
      .select((col("h") + col("o")).as("c"), col("total"))
      .groupBy(col("c"))
      .agg(sum(col("total")).as("sum25"), count(lit(1)).as("n25"))
    val base = hourly.join(ag, col("h") === col("c"))
      .filter(col("n25") === win)
      .select(col("h"), col("total"), col("sum25"))
      .cpGuard() // feeds the hod means AND the output rows
    val hod = base.groupBy((col("h") % 24).as("hod"))
      .agg(sum(col("total") * win - col("sum25")).as("s_num"),
        count(lit(1)).as("s_cnt"))
    val seasonal = col("s_num").cast("double") /
      (col("s_cnt") * win).cast("double")
    base.join(broadcast(hod), col("h") % 24 === col("hod"))
      .select(col("h"), col("total").as("total_cents"),
        (col("sum25").cast("double") / lit(win.toDouble)).as("trend"),
        seasonal.as("seasonal"),
        ((col("total") * win - col("sum25")).cast("double") /
          lit(win.toDouble) - seasonal).as("resid"))
      .orderBy(col("h"))
  }

  /** Time-series motif discovery (matrix-profile-lite): per user, the
    * pair of NON-OVERLAPPING length-`m` windows of the value series
    * (ordered by ts, event_id) with minimal sum-of-absolute-differences
    * — the repeated-behavior detector (scripted/bot cadences repeat a
    * value shape; organic activity doesn't). SAD in exact integer
    * cents instead of the z-normalized Euclidean of the full matrix
    * profile (Yeh et al. ICDM'16): no sqrt, no float accumulation, so
    * every candidate distance is oracle-checkable bit-for-bit.
    *
    * Argmin tie-break is the lexicographic (sad, i, j) minimum —
    * deterministic under any partitioning (min over a struct).
    *
    * Scale shape: the windows table is one partitioned window pass
    * (frame = current..m-1 following); the pair join is the
    * [[theilSen]] per-key self-join contract — shuffle-hash on
    * user_id, pairs bounded by the per-key window count squared, never
    * cross-user. Users with < 2m events have no admissible pair and
    * drop out. At 100 TB you'd bound long-lived keys by sessionizing
    * first (the standard matrix-profile batching cut).
    *
    * Output: (user_id, n_pairs, i, j, sad_cents), i/j 1-based window
    * starts with j >= i + m.
    */
  def motif(events: DataFrame, m: Int = 4): DataFrame = {
    require(m >= 2, s"window length >= 2: $m")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val c = events.select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("arr", collect_list(col("cents"))
        .over(w.rowsBetween(Window.currentRow, m - 1)))
      .filter(size(col("arr")) === m)
      .select(col("user_id"), col("i"), col("arr"))
    val a = c.toDF("user_id", "i", "arr_a")
    val b = c.toDF("user_id", "j", "arr_b")
    a.join(b.hint("shuffle_hash"), Seq("user_id"))
      .filter(col("j") >= col("i") + m)
      .withColumn("sad", aggregate(
        zip_with(col("arr_a"), col("arr_b"),
          (x: Column, y: Column) => abs(x - y)),
        lit(0L), (acc: Column, v: Column) => acc + v))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("sad"), col("i"), col("j"))).as("best"))
      .select(col("user_id"), col("n_pairs"),
        col("best.i").as("i"), col("best.j").as("j"),
        col("best.sad").as("sad_cents"))
      .orderBy(col("user_id"))
  }

  /** Mann-Whitney U drift test between the value distributions before
    * and after `cutTs` — the rank-based companion to [[ksTest]]: KS
    * asks "do the CDFs separate anywhere", U asks "does one side
    * stochastically dominate" (and is the standard nonparametric
    * location-shift alarm when distributions are non-normal). U is
    * computed through the exact midrank rank-sum identity shared with
    * [[TextAnalysis.aucFromScored]] (U/(n₁n₂) IS the common-language
    * effect size / AUC, so the machinery is literally the same):
    * integer cents scores, per-score groups, exclusive PrefixSum for
    * rows-before, DECIMAL(38,0) totals — no IEEE arithmetic.
    *
    * Output: ONE row (n_after, n_before, n_distinct_scores, u2_after =
    * 2·U_after, u2_den = 2·n_after·n_before, superiority_ppm =
    * floor(10⁶·U/(n₁n₂))) — 500000 ppm = no drift, 1e6 = complete
    * dominance of the after side.
    */
  def mannWhitneyDrift(events: DataFrame, cutTs: String): DataFrame =
    TextAnalysis.aucFromScored(events.select(
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("score"),
        (col("ts") >= expr(cutTs)).as("pos")))
      .select(col("n_pos").as("n_after"), col("n_neg").as("n_before"),
        col("n_distinct_scores"), col("auc_num").as("u2_after"),
        col("auc_den").as("u2_den"), col("auc_ppm").as("superiority_ppm"))

  /** Pettitt changepoint test (Pettitt 1979) over the global cents
    * series in (ts, event_id) order — WHERE did the distribution
    * shift, the location companion to [[mannWhitneyDrift]]'s "did it
    * shift at a KNOWN cut": U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i − x_j), the
    * changepoint is the t maximizing |U_t| (earliest on ties).
    *
    * The naive U_t is O(n²); the exact identity U_t = Σ_{i≤t} 2R_i −
    * t(n+1) (2R = twice the midrank, integer — holds exactly under
    * ties since sgn contributes 0 where midranks add ½) makes it two
    * balanced prefix passes: midranks from per-cents groups + an
    * exclusive [[graft.operators.PrefixSum.withRunningSum]] over cents
    * order (the t30/w37 discipline), then one combined
    * [[graft.operators.PrefixSum.withRunningSums]] pass +
    * [[graft.operators.SeqNumber]] over TIME order. No unpartitioned
    * window, no pairwise join, all BIGINT.
    *
    * Output: ONE row (n, k_stat = max|U_t|, cp_ts_us, u_at_cp).
    */
  def pettittChangepoint(events: DataFrame): DataFrame =
    pettittOf(events.select(col("event_id"),
      unix_micros(col("ts")).as("tus"),
      (col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents")))
      .select(col("n"), col("k_stat"), col("cp_ts_us"), col("u_at_cp"))

  /** Pettitt core over a prepared (event_id, tus, cents) table — the
    * shared statistic behind [[pettittChangepoint]] and
    * [[pettittSegments]]. Returns ONE row (n, k_stat, cp_ts_us,
    * cp_event_id, u_at_cp), or ZERO rows for empty input.
    */
  private def pettittOf(b: DataFrame): DataFrame = {
    val grp = b.groupBy(col("cents")).agg(count(lit(1)).as("ng"))
    val withBefore = graft.operators.PrefixSum.withRunningSum(
      grp, Seq(col("cents").asc), "ng", "c_before")
      .select(col("cents"),
        (lit(2) * col("c_before") + col("ng") + lit(1)).as("r2"))
    val ranked = b.join(withBefore, Seq("cents"))
    val order = Seq(col("tus").asc, col("event_id").asc)
    // one combined pass: the running sum of r2 and the 1..N sequence
    // share the identical total order, so composing the two operators
    // paid the range-partition + sort + checkpoint + collect pipeline
    // twice over the same rows
    val seq = graft.operators.PrefixSum.withRunningSums(
      ranked, order, Seq("r2" -> "excl"), Some("i"))
    val nRow = b.agg(count(lit(1)).as("n"))
    val u = seq.crossJoin(broadcast(nRow))
      .select(col("tus"), col("event_id"), col("n"),
        (col("excl") + col("r2") - col("i") * (col("n") + lit(1)))
          .as("ut"))
      .cpGuard() // read twice: the max pass + the argmax row
    val k = u.agg(max(abs(col("ut"))).as("k_stat"))
    u.join(broadcast(k), abs(col("ut")) === col("k_stat"))
      .orderBy(col("tus"), col("event_id")).limit(1)
      .select(col("n"), col("k_stat"), col("tus").as("cp_ts_us"),
        col("event_id").as("cp_event_id"), col("ut").as("u_at_cp"))
  }

  /** Binary-segmentation changepoints (Scott & Knott 1974 shape over
    * the Pettitt statistic): the global [[pettittChangepoint]] splits
    * the series, then the SAME exact midrank statistic re-runs inside
    * each side — the standard way one changepoint test becomes a
    * multi-changepoint segmentation. Midranks are recomputed WITHIN
    * each segment (a segment's own distribution is what its U
    * statistic must see), so each side is simply the core over a
    * filtered table; the only driver-side value is the 1-row global
    * cp used as the split boundary (bounded-collect contract).
    *
    * Output: up to three rows (segment ∈ all/left/right, n, k_stat,
    * cp_ts_us, u_at_cp); a side that is empty contributes no row.
    */
  def pettittSegments(events: DataFrame): DataFrame = {
    val b = events.select(col("event_id"),
      unix_micros(col("ts")).as("tus"),
      (col("value").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
      .cpGuard() // three statistic passes read it
    val all = pettittOf(b).cpGuard()
    val cp = all.collect()
    def seg(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("segment"), col("n"), col("k_stat"),
        col("cp_ts_us"), col("u_at_cp"))
    if (cp.isEmpty) return seg("all", all).limit(0)
    val (cpT, cpE) = (cp(0).getLong(2), cp(0).getLong(3))
    val isLeft = col("tus") < cpT ||
      (col("tus") === cpT && col("event_id") <= cpE)
    // the two side statistics read only the checkpointed base table —
    // their prefix/rank jobs are independent, so overlap them (guide
    // §2.6); each side still computes exactly its own midranks
    val (leftStat, rightStat) = graft.core.Par.eval2(
      pettittOf(b.filter(isLeft)), pettittOf(b.filter(!isLeft)))
    seg("all", all)
      .unionAll(seg("left", leftStat))
      .unionAll(seg("right", rightStat))
      .orderBy(col("segment"))
  }

  /** Peak-concurrency record audit by sweep line: each event opens a
    * half-open activity interval `[ts, ts + dur)` (dur = floor(value *
    * 60) + 1 whole seconds — one IEEE multiply both engines perform
    * identically, never zero-length), and the output is every instant
    * at which the number of simultaneously open intervals sets a NEW
    * all-time record — the concurrency ramp curve a capacity planner
    * reads, at the cost of two balanced passes instead of the classic
    * single-task `SUM OVER (ORDER BY ...)` sweep.
    *
    * Scale shape: interval endpoints become +1/-1 deltas (2 rows per
    * event, one narrow projection); concurrency after each sweep point
    * is an exclusive [[graft.operators.PrefixSum.withRunningSum]] plus
    * the point's own delta, and "new record" is an exclusive
    * [[graft.operators.PrefixSum.withRunningMax]] strictly below it —
    * both range-partitioned over the sweep order (t, d, event_id), so
    * no unpartitioned window anywhere. Ends sort before starts at the
    * same instant (d = -1 < +1): touching intervals never overlap,
    * matching the half-open convention.
    *
    * Output: (ts_us, concurrency) per record-setting instant, epoch
    * microseconds ascending.
    */
  def concurrencyRecords(events: DataFrame): DataFrame = {
    val e = events.select(
      col("event_id"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        (floor(col("value") * 60).cast("long") + 1L) * 1000000L).as("en"))
    val sweep = e.select(explode(array(
        struct(col("s").as("t"), lit(1L).as("d"), col("event_id")),
        struct(col("en").as("t"), lit(-1L).as("d"), col("event_id"))))
        .as("p"))
      .select(col("p.t"), col("p.d"), col("p.event_id"))
    val order = Seq(col("t").asc, col("d").asc, col("event_id").asc)
    val summed = graft.operators.PrefixSum
      .withRunningSum(sweep, order, "d", "excl")
      .withColumn("conc", col("excl") + col("d"))
    graft.operators.PrefixSum
      .withRunningMax(summed, order, "conc", "hw")
      .filter(col("hw").isNull || col("hw") < col("conc"))
      .select(col("t").as("ts_us"), col("conc").as("concurrency"))
      .orderBy(col("ts_us"))
  }

  /** Cross-user interval-OVERLAP join via bucket decomposition — the
    * range-join-to-equi-join rewrite every published interval-join
    * engine uses (and the pattern that keeps 100 TB of intervals off a
    * theta join): each half-open activity interval [s, e) (the w36
    * derivation: start = ts, duration = (floor(value·60)+1) s) explodes
    * into the fixed-width time buckets it covers (fan-out bounded by
    * ceil(maxDur/bucket)+1 rows), candidates meet in a hash-partitioned
    * equi-join on bucket id, and each truly-overlapping pair is counted
    * EXACTLY ONCE by the canonical-bucket rule — only the bucket
    * containing max(s_a, s_b) (the overlap's left edge) emits the pair,
    * so no distinct pass over the candidate stream is ever needed.
    * Strict overlap (half-open touching excluded); same-user pairs
    * excluded (self-concurrency is w36's sweep); `userCap` bounds the
    * cohort the way doc_id < 200 bounds the multimodal suite.
    *
    * Output: per user pair (user_a < user_b) — n_pairs of overlapping
    * intervals and their exact total overlap in µs; ordered.
    */
  def intervalOverlap(events: DataFrame, userCap: Long = 30L,
                      bucketUs: Long = 60000000L): DataFrame = {
    require(userCap > 0 && bucketUs > 0, "positive cohort cap and bucket")
    val iv = events.filter(col("user_id") < userCap)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          (floor(col("value") * 60).cast("long") + 1L) * 1000000L).as("e"))
    // half-open [s, e): last covered bucket is (e-1) div bucket.
    // Integral `div`, never `/`: double division truncation can land
    // one bucket off at exact boundaries (the w43 discipline)
    val banded = iv.select(col("event_id"), col("user_id"), col("s"), col("e"),
      explode(sequence(expr(s"s div $bucketUs"),
        expr(s"(e - 1) div $bucketUs"))).as("bk"))
    val a = banded.toDF("id_a", "user_a", "s_a", "e_a", "bk")
    val b = banded.toDF("id_b", "user_b", "s_b", "e_b", "bk")
    a.join(b, Seq("bk"))
      .filter(col("user_a") < col("user_b") &&
        col("s_a") < col("e_b") && col("s_b") < col("e_a") &&
        // canonical bucket: the one holding the overlap's left edge
        col("bk") === expr(s"greatest(s_a, s_b) div $bucketUs"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(least(col("e_a"), col("e_b")) -
          greatest(col("s_a"), col("s_b"))).as("overlap_us"))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** Seasonality-strength audit of the hourly load series — the MASE
    * idea (Hyndman & Koehler 2006) pointed at the daily cycle: compare
    * the sum of absolute one-hour-lag errors (the naive forecast)
    * against the 24-hour-lag errors (the seasonal-naive forecast);
    * ratio < 1 ppm-scaled means yesterday-same-hour predicts better
    * than last-hour — the "is there a daily rhythm worth modeling"
    * gate before any forecasting work. A lag term exists only when the
    * lagged hour was OBSERVED (calendar gaps contribute no term).
    *
    * Scale shape: hourly counts are one partial-aggregable groupBy;
    * both lags are EQUI-SELF-JOINS on the integer hour id (hr−1,
    * hr−24) — never a global-order window (the w36 discipline); the
    * output is one constant-size aggregation. Exact integers; the
    * ratio is a guarded integral div (NULL when the naive error is 0 —
    * a constant series has nothing to forecast).
    */
  def seasonalStrength(events: DataFrame): DataFrame = {
    val hours = events
      .select(expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("c"))
      .cpGuard() // three self-join sides
    def lagged(k: Int, tag: String) = hours.toDF("hr0", s"c_$tag")
      .withColumn("hr", col("hr0") + k).drop("hr0")
    hours
      .join(lagged(1, "n"), Seq("hr"), "left")
      .join(lagged(24, "s"), Seq("hr"), "left")
      .agg(count(lit(1)).as("n_hours"),
        count(col("c_n")).as("n_naive"),
        count(col("c_s")).as("n_seasonal"),
        sum(abs(col("c") - col("c_n"))).as("sae_naive"),
        sum(abs(col("c") - col("c_s"))).as("sae_seasonal"))
      .select(col("n_hours"), col("n_naive"), col("n_seasonal"),
        col("sae_naive"), col("sae_seasonal"),
        expr("""CAST(CASE WHEN sae_naive > 0
                 THEN sae_seasonal * 1000000 div sae_naive
                 ELSE NULL END AS BIGINT)""").as("seasonal_ratio_ppm"))
  }

  /** Burst detection over the hourly load series: every maximal run of
    * hours whose event count exceeds `num/den` × the TRAILING 24-hour
    * average (full windows only — the first day and calendar gaps
    * cannot alarm on partial baselines). The thresholded two-state
    * reading of Kleinberg's burst model that monitoring actually
    * deploys; w27's CUSUM tracks cumulative drift, this flags
    * localized rate spikes and reports them as INTERVALS.
    *
    * Exactness: threshold compares cross-multiplied integers
    * (c·24·den > s24·num — no float ratio, no edge ambiguity); burst
    * grouping is gaps-and-islands (h − rank is constant within a
    * consecutive run) over the flagged hours via [[graft.operators
    * .SeqNumber]], never an unpartitioned window.
    *
    * Scale shape: one groupBy(hour); the trailing window is the w35
    * offset-explode (24 rows per hour, partial-aggregable groupBy) —
    * calendar-indexed, so series gaps shrink n24 and are excluded
    * rather than silently stretching the window; flagged hours are by
    * construction the sparse tail.
    *
    * Output: (start_h, end_h, n_hours, peak_count, excess_num) per
    * burst, start ascending; excess_num = Σ(24·den·c − num·s24), the
    * integer-scaled area above the threshold.
    */
  def bursts(events: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num > den, "threshold num/den > 1")
    val hourly = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("c"))
      .cpGuard() // feeds both the trailing window and the flag join
    val trail = hourly
      .select(explode(sequence(lit(1), lit(24))).as("o"), col("h"),
        col("c"))
      .select((col("h") + col("o")).as("h2"), col("c"))
      .groupBy(col("h2"))
      .agg(sum(col("c")).as("s24"), count(lit(1)).as("n24"))
    val flagged = hourly.join(trail, col("h") === col("h2"))
      .filter(col("n24") === 24 &&
        col("c") * (24L * den) > col("s24") * num)
      .select(col("h"), col("c"), col("s24"))
    graft.operators.SeqNumber.withSeq(flagged, Seq(col("h").asc), "rn")
      .withColumn("g", col("h") - col("rn"))
      .groupBy(col("g"))
      .agg(min(col("h")).as("start_h"), max(col("h")).as("end_h"),
        count(lit(1)).as("n_hours"), max(col("c")).as("peak_count"),
        sum(col("c") * (24L * den) - col("s24") * num).as("excess_num"))
      .select(col("start_h"), col("end_h"), col("n_hours"),
        col("peak_count"), col("excess_num"))
      .orderBy(col("start_h"))
  }

  /** Exact Spearman rank correlation between the two hourly load
    * series (X = events per hour, Y = value-cents per hour) — "do busy
    * hours carry proportionally more value", robust to the heavy tails
    * that break Pearson on raw values. Spearman = Pearson over
    * midranks; midranks are kept as INTEGER doubled midranks (2R =
    * 2·c_before + ties + 1, the t30/w37/w38 discipline — the doubling
    * cancels in the correlation), so every moment (n, ΣR, ΣR², ΣRxRy)
    * is exact BIGINT and the ONLY IEEE arithmetic is the final
    * num/(√d1·√d2) at the read edge.
    *
    * Scale shape: one groupBy(hour) builds the series; each rank table
    * is a groupBy(value) + exclusive [[graft.operators.PrefixSum
    * .withRunningSum]] over value order — range-partitioned, never an
    * unpartitioned window — and joins back by value (1 row per
    * DISTINCT value on the build side, broadcast-or-hash at any
    * scale); one hash aggregation collapses the moments.
    *
    * Output: ONE row (n_hours, num = n·Sxy − Sx·Sy, d1 = n·Sxx − Sx²,
    * d2 = n·Syy − Sy², rho = num/(√d1·√d2)).
    */
  def spearmanHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("x"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("y"))
      .cpGuard() // feeds both rank builds and the joined moments pass
    def rank2(c: String, out: String): DataFrame = {
      val grp = hourly.groupBy(col(c)).agg(count(lit(1)).as("ng"))
      graft.operators.PrefixSum
        .withRunningSum(grp, Seq(col(c).asc), "ng", "cb")
        .select(col(c), (lit(2) * col("cb") + col("ng") + lit(1)).as(out))
    }
    hourly
      .join(rank2("x", "rx2"), Seq("x"))
      .join(rank2("y", "ry2"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"),
        sum(col("rx2") * col("ry2")).as("sxy"))
      .select(col("n").as("n_hours"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("d1"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("d2"))
      // a constant series has zero rank variance (d = 0): rho is
      // undefined there — degrade to NULL, never an ANSI
      // divide-by-zero crash (the RobustnessSpec contract)
      .withColumn("rho",
        when(col("d1") > 0 && col("d2") > 0,
          col("num").cast("double")
            / (sqrt(col("d1").cast("double"))
              * sqrt(col("d2").cast("double")))))
  }
}
