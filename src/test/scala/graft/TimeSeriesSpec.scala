package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ext.TimeSeries
import graft.operators.AsOfJoin

import java.sql.Timestamp

/** Semantic checks for the round-9 time-series operators (the oracle
  * gate checks cross-engine equality; these pin the SEMANTICS on
  * hand-computable inputs).
  */
class TimeSeriesSpec extends SparkSpec {

  private def ts(min: Int, us: Int = 0): Timestamp =
    new Timestamp(min * 60000L + us / 1000L)

  private def events(rows: (Long, Int, Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("event_id", "min", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_millis(col("min") * 60000L))
      .drop("min")
  }

  test("ema is the left fold of the recurrence, seeded by the first value") {
    val ev = events(
      (1L, 0, 1L, "view", 8.0), (2L, 1, 1L, "view", 4.0),
      (3L, 2, 1L, "view", 6.0), (4L, 0, 2L, "view", 5.0))
    val got = TimeSeries.ema(ev, alpha = 0.25).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1: 8 -> 8+0.25*(4-8)=7 -> 7+0.25*(6-7)=6.75
    assert(got(1L) == (3L, 6.75))
    assert(got(2L) == (1L, 5.0)) // single event: ema = the value
  }

  test("ema ordering is by (ts, event_id), not input order") {
    val ev = events(
      (2L, 1, 1L, "view", 100.0), (1L, 0, 1L, "view", 0.0))
    val Array(r) = TimeSeries.ema(ev, alpha = 0.25).collect()
    assert(r.getDouble(2) == 25.0) // 0 then +0.25*(100-0)
  }

  test("time-weighted average: value holds until next event, last row unweighted") {
    // user 1: value 10 for 60s, then 20 for 120s -> (10*60+20*120)/180
    val ev = events(
      (1L, 0, 1L, "view", 10.0), (2L, 1, 1L, "view", 20.0),
      (3L, 3, 1L, "view", 999.0)) // 999 never weighted (no successor)
    val Array(r) = TimeSeries.timeWeightedAvg(ev).collect()
    assert(r.getLong(1) == 2L)          // n_intervals
    assert(r.getLong(2) == 180L)        // total_s
    assert(r.getDouble(3) == (10.0 * 60 + 20.0 * 120) / 180.0)
  }

  test("twa of a constant series is that constant") {
    val ev = events((1L, 0, 7L, "view", 3.25), (2L, 5, 7L, "view", 3.25),
      (3L, 11, 7L, "view", 3.25))
    val Array(r) = TimeSeries.timeWeightedAvg(ev).collect()
    assert(r.getDouble(3) == 3.25)
  }

  test("ohlc bar invariants and first/last order") {
    val ev = events(
      (1L, 0, 1L, "view", 5.0), (2L, 10, 1L, "view", 9.0),
      (3L, 20, 1L, "view", 2.0), (4L, 30, 1L, "view", 7.0),
      (5L, 70, 1L, "view", 1.0)) // second hour
    val rows = TimeSeries.ohlc(ev).collect()
    assert(rows.length == 2)
    val bar = rows(0)
    assert(bar.getDouble(2) == 5.0) // open
    assert(bar.getDouble(3) == 9.0) // high
    assert(bar.getDouble(4) == 2.0) // low
    assert(bar.getDouble(5) == 7.0) // close
    assert(bar.getDouble(6) == 23.0) // volume
    assert(bar.getLong(7) == 4L)
  }

  test("cusum window formulation equals the clamp recursion, alarms counted") {
    // hand case: k=5.00, h=10.00; values 20, 1, 1, 20 ->
    // s: 15.00, 11.00, 7.00, 22.00 -> alarms at s=15, 11(?), 22
    val ev = events(
      (1L, 0, 1L, "view", 20.0), (2L, 1, 1L, "view", 1.0),
      (3L, 2, 1L, "view", 1.0), (4L, 3, 1L, "view", 20.0))
    val Array(r) = TimeSeries.cusum(ev, kCents = 500L, hCents = 1000L)
      .collect()
    // recursion: 1500, max(0,1500+100-500)=1100, 700, 2200
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 3L)     // 1500, 1100, 2200 > 1000
    assert(r.getLong(3) == 2200L)  // final s
  }

  test("cusum equals the brute recursion on a random-ish series") {
    val vals = (1 to 40).map(i => ((i * 37) % 100) / 4.0 + 1.0)
    val ev = events(vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, i, 9L, "view", v)
    }: _*)
    val Array(r) = TimeSeries.cusum(ev, kCents = 1500L, hCents = 4000L)
      .collect()
    var s = 0L; var a = 0L
    vals.foreach { v =>
      s = math.max(0L, s + math.round(v * 100) - 1500L)
      if (s > 4000L) a += 1
    }
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((40L, a, s)))
  }

  test("firstAfter attaches the earliest right row at-or-after, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 25L), (2L, 10L))
      .toDF("k", "t").withColumn("ts", timestamp_millis(col("t") * 1000))
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
      .toDF("k", "t2", "p").withColumn("ts", timestamp_millis(col("t2") * 1000))
      .select(col("k"), col("ts"), col("p"))
    val got = AsOfJoin.firstAfter(
      left.select(col("k"), col("ts"), col("t")), right, "k", "ts", Seq("p"))
      .orderBy(col("k"), col("t")).collect()
    // left(1,10) -> right at exactly 10 ("a"); left(1,25) -> 30 ("c");
    // left(2,10) -> no right for key 2 -> nulls
    assert(got(0).getAs[String]("asof_p") == "a")
    assert(got(1).getAs[String]("asof_p") == "c")
    assert(got(2).getAs[String]("asof_p") == null)
  }

  test("nearest picks the |gap|-minimal side, ties backward, one side null-safe") {
    import spark.implicits._
    def tdf(rows: Seq[(Long, Long, String)]) =
      rows.toDF("k", "t2", "p")
        .withColumn("ts", timestamp_millis(col("t2") * 1000))
        .select(col("k"), col("ts"), col("p"))
    val left = Seq((1L, 20L), (2L, 20L), (3L, 20L))
      .toDF("k", "t").withColumn("ts", timestamp_millis(col("t") * 1000))
      .select(col("k"), col("ts"))
    val right = tdf(Seq(
      (1L, 10L, "back"), (1L, 24L, "fwd"),   // fwd closer (4 < 10)
      (2L, 15L, "tieB"), (2L, 25L, "tieF"),  // tie -> backward
      (3L, 30L, "onlyF")))                   // no backward row
    val got = AsOfJoin.nearest(left, right, "k", "ts", Seq("p")).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_p")).toMap
    assert(got == Map(1L -> "fwd", 2L -> "tieB", 3L -> "onlyF"))
  }

  test("firstAfter and lastBefore agree on exact-timestamp matches") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
      .withColumn("ts", timestamp_millis(col("t") * 1000))
    val right = Seq((1L, 10L, "x")).toDF("k", "t2", "p")
      .withColumn("ts", timestamp_millis(col("t2") * 1000))
      .select(col("k"), col("ts"), col("p"))
    val l = left.select(col("k"), col("ts"))
    val back = AsOfJoin.lastBefore(l, right, "k", "ts", Seq("p")).collect()
    val fwd = AsOfJoin.firstAfter(l, right, "k", "ts", Seq("p")).collect()
    assert(back.head.getAs[String]("asof_p") == "x")
    assert(fwd.head.getAs[String]("asof_p") == "x")
  }

  test("acf: alternating series gives the exact rational r_k, quantized at 1024") {
    // cents 100,300,100,300: d = (-400,400,-400,400), den = 640000
    // lag1: num=-480000 -> r=-3/4 -> -768; lag2: 320000 -> 1/2 -> 512;
    // lag3: -160000 -> -1/4 -> -256
    val ev = events(
      (1L, 0, 1L, "view", 1.0), (2L, 1, 1L, "view", 3.0),
      (3L, 2, 1L, "view", 1.0), (4L, 3, 1L, "view", 3.0))
    val got = TimeSeries.acf(ev, maxLag = 3).collect()
      .map(r => r.getInt(1) -> r.getLong(4)).toMap
    assert(got == Map(1 -> -768L, 2 -> 512L, 3 -> -256L))
  }

  test("acf: constant series is dropped (den = 0), short series loses deep lags") {
    val ev = events(
      (1L, 0, 1L, "view", 5.0), (2L, 1, 1L, "view", 5.0),
      (3L, 2, 1L, "view", 5.0),                       // constant: den=0
      (4L, 0, 2L, "view", 1.0), (5L, 1, 2L, "view", 2.0)) // n=2: lag 1 only
    val got = TimeSeries.acf(ev, maxLag = 3).collect()
    assert(got.forall(_.getLong(0) == 2L))
    assert(got.map(_.getInt(1)).toSeq == Seq(1)) // lags 2,3 have no pairs
  }

  test("ks statistic: exact max CDF gap, zero on identical samples") {
    val cut = "TIMESTAMP '1970-01-01 00:05:00'"
    // A = {1.00, 2.00}, B = {2.00, 3.00}: D = 1/2 exactly
    val ev = events(
      (1L, 0, 1L, "view", 1.0), (2L, 1, 1L, "view", 2.0),
      (3L, 10, 2L, "view", 2.0), (4L, 11, 2L, "view", 3.0))
    val Array(r) = TimeSeries.ksTest(ev, cut).collect()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 2L)      // max |ca*2 - cb*2|
    assert(r.getDouble(3) == 0.5)
    // identical halves: D = 0
    val same = events(
      (1L, 0, 1L, "view", 7.0), (2L, 1, 1L, "view", 9.0),
      (3L, 10, 2L, "view", 7.0), (4L, 11, 2L, "view", 9.0))
    val Array(r2) = TimeSeries.ksTest(same, cut).collect()
    assert(r2.getLong(2) == 0L && r2.getDouble(3) == 0.0)
  }

  test("theil-sen: median slope shrugs off an outlier point") {
    // three collinear points at 100 cents/hour plus one wild outlier:
    // slopes sorted = (100,100,100,3300,4900,9700), lower median = 100
    val ev = events(
      (1L, 0, 1L, "view", 1.0), (2L, 60, 1L, "view", 2.0),
      (3L, 120, 1L, "view", 3.0), (4L, 180, 1L, "view", 100.0))
    val Array(r) = TimeSeries.theilSen(ev).collect()
    assert(r.getLong(1) == 6L)            // n_pairs
    assert(r.getLong(2) == 100L)          // min_slope
    assert(r.getLong(3) == 9700L)         // max_slope
    assert(r.getLong(4) == 100L)          // sen_slope_cph
  }

  test("theil-sen: negative slopes floor toward -inf, equal-ts pairs excluded") {
    // 1.00 -> 0.50 over 90 min: floor(-50*3.6e9/5.4e9) = floor(-33.33) = -34
    val ev = events(
      (1L, 0, 3L, "view", 1.0), (2L, 90, 3L, "view", 0.5),
      (3L, 90, 3L, "view", 9.9)) // same ts as event 2: pair (2,3) excluded
    val Array(r) = TimeSeries.theilSen(ev).collect()
    assert(r.getLong(1) == 2L)   // (1,2),(1,3) and NOT the equal-ts (2,3)
    assert(r.getLong(2) == -34L) // min: floor(-33.33) = -34, not -33
    assert(r.getLong(3) == 593L) // (1,3): floor(890*3.6e9/5.4e9)
    assert(r.getLong(4) == -34L) // lower median of (-34, 593)
  }

  /** The integer Holt recurrence, recomputed driver-side. */
  private def holtBrute(cents: Seq[Long]): (Long, Long) =
    cents.tail.foldLeft((cents.head << 20, 0L)) { case ((l, b), x) =>
      val lNew = ((x << 20) + 3L * (l + b)) >> 2
      (lNew, (lNew - l + b) >> 1)
    }

  test("holt equals the brute integer recurrence; trend tracks a ramp") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val ev = events(vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, i * 5, 1L, "view", v) }: _*)
    val Array(r) = TimeSeries.holt(ev).collect()
    val (l, b) = holtBrute(vals.map(v => (v * 100).round))
    assert(r.getLong(1) == 8L)
    assert(r.getDouble(2) == l.toDouble / 104857600.0)
    assert(r.getDouble(3) == b.toDouble / 104857600.0)
    assert(r.getDouble(4) == (l + 4L * b).toDouble / 104857600.0)
    // a steady +1/step ramp: level trails the last value, trend is
    // positive, and the 4-ahead forecast overshoots the last level
    assert(r.getDouble(3) > 0.5)
    assert(r.getDouble(4) > r.getDouble(2))
  }

  test("holt negative trend floors via arithmetic shift, not truncation") {
    // decreasing series drives b negative; cross-check vs the brute
    // fold, which uses Java's arithmetic >> (floor) — a truncating
    // division would differ on the first odd negative numerator
    val vals = Seq(9.99, 7.37, 5.01, 2.23, 0.11)
    val ev = events(vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, i * 3, 4L, "view", v) }: _*)
    val Array(r) = TimeSeries.holt(ev).collect()
    val (l, b) = holtBrute(vals.map(v => (v * 100).round))
    assert(b < 0L)
    assert(r.getDouble(2) == l.toDouble / 104857600.0)
    assert(r.getDouble(3) == b.toDouble / 104857600.0)
  }

  test("motif finds a planted repeated shape, ignoring the overlap zone") {
    // user 1: shape (1,5,2,7) planted at positions 1 and 9 inside noise
    val vals = Seq(1.0, 5.0, 2.0, 7.0, 50.0, 90.0, 30.0, 60.0,
      1.0, 5.0, 2.0, 7.0)
    val ev = events(vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, i * 2, 1L, "view", v) }: _*)
    val Array(r) = TimeSeries.motif(ev, m = 4).collect()
    assert(r.getLong(2) == 1L && r.getLong(3) == 9L) // the planted pair
    assert(r.getLong(4) == 0L)                       // exact repeat: SAD 0
    // n_pairs: windows 1..9, pairs with j >= i+4 -> sum_{i=1..5}(6-i)=15...
    assert(r.getLong(1) == 15L)
  }

  test("motif excludes overlapping pairs and ties break to lowest (i, j)") {
    // constant series: every pair has SAD 0; argmin must be (1, 5)
    val ev = events((1 to 8).map(i =>
      (i.toLong, i * 7, 2L, "view", 3.0)): _*)
    val Array(r) = TimeSeries.motif(ev, m = 4).collect()
    assert(r.getLong(2) == 1L && r.getLong(3) == 5L && r.getLong(4) == 0L)
    // windows 1..5; admissible pairs: (1,5) only -> plus (1..5 vs j>=i+4)
    assert(r.getLong(1) == 1L)
  }

  test("motif: users with fewer than 2m events emit no row") {
    val ev = events((1 to 7).map(i =>
      (i.toLong, i, 3L, "view", 1.0)): _*)
    assert(TimeSeries.motif(ev, m = 4).count() == 0L)
  }

  test("seasonal decomposition: reconstruction, hod-constant seasonal, edges cut") {
    // 4 days, one event per hour: value = 10 + (2 if midnight else 0)
    val ev = events((0 until 96).map { h =>
      ((h + 1).toLong, h * 60, 1L, "view",
        if (h % 24 == 0) 12.0 else 10.0) }: _*)
    val got = graft.ext.TimeSeries.seasonalDecompose(ev).collect()
    // hours 0..11 and 84..95 lack a full 25h window
    assert(got.length == 96 - 24)
    val hs = got.map(_.getLong(0))
    assert(hs.min == 12L && hs.max == 83L)
    got.foreach { r =>
      val (total, trend, seasonal, resid) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(total - (trend + seasonal + resid)) < 1e-6,
        s"reconstruction broke at h=${r.getLong(0)}")
    }
    // seasonal depends only on hour-of-day
    val byHod = got.groupBy(r => r.getLong(0) % 24)
      .map { case (k, rs) => k -> rs.map(_.getDouble(3)).distinct }
    assert(byHod.values.forall(_.size == 1))
    // midnight's seasonal is the one positive spike, ~ +2*24/25 cents-ish
    val s0 = byHod(0L).head
    assert(s0 > 100.0, s"midnight seasonal $s0") // +2.00 -> +200 cents scale
    assert(byHod.filterKeys(_ != 0L).values.forall(_.head < 0.0))
  }

  test("kaplan-meier: risk sets shrink by deaths AND censored, product folds") {
    // lifetimes (hours): A=1 churn, C=1 churn, B=2 churn,
    // D=166 censored (still active at corpus end)
    val ev = events(
      (1L, 0, 1L, "view", 1.0), (2L, 60, 1L, "view", 1.0),     // A: 1h
      (3L, 0, 2L, "view", 1.0), (4L, 120, 2L, "view", 1.0),    // B: 2h
      (5L, 0, 3L, "view", 1.0), (6L, 60, 3L, "view", 1.0),     // C: 1h
      (7L, 0, 4L, "view", 1.0), (8L, 10000, 4L, "view", 1.0))  // D: open
    val got = graft.ext.Funnels.kaplanMeier(ev, censorDays = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=1: 2 deaths of 4 at risk -> S=0.5; t=2: 1 of 2 -> S=0.25;
    // D's censoring emits no row but holds D in the t<=2 risk sets? no —
    // D (dur 166) is at risk at t=1 (4 at risk) and t=2 (2 at risk:
    // B and D, A/C already gone)
    assert(got.toSeq == Seq((1L, 4L, 2L, 0.5), (2L, 2L, 1L, 0.25)))
  }

  test("kaplan-meier: empty input yields an empty curve") {
    val ev = events().limit(0)
    assert(graft.ext.Funnels.kaplanMeier(ev).count() == 0L)
  }

  test("holt single-event user: level = value, zero trend") {
    val ev = events((1L, 0, 2L, "view", 5.25))
    val Array(r) = TimeSeries.holt(ev).collect()
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == 5.25 && r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 5.25)
  }

  test("concurrency records: every new all-time peak, and only those") {
    // dur = floor(value*60)+1 s: e1 [0,121) e2 [60,121) e3 [120,121)
    // e4 [180,211) — ramp 1,2,3 then everything closes at t=121
    val ev = events(
      (1L, 0, 1L, "view", 2.0), (2L, 1, 1L, "view", 1.0),
      (3L, 2, 2L, "view", 0.0), (4L, 3, 2L, "view", 0.5))
    val got = TimeSeries.concurrencyRecords(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (60000000L, 2L), (120000000L, 3L)))
  }

  test("mann-whitney: complete after-dominance scores 10^6 ppm, symmetric split 1/2") {
    // before {1c, 2c}, after {3c, 4c}: U_after = 4 = n1*n2
    val ev = events(
      (1L, 0, 1L, "v", 0.01), (2L, 1, 1L, "v", 0.02),
      (3L, 2, 1L, "v", 0.03), (4L, 3, 1L, "v", 0.04))
    val cut = "TIMESTAMP '1970-01-01 00:02:00'"
    val Array(r) = TimeSeries.mannWhitneyDrift(ev, cut).collect()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(3) == 8L && r.getLong(4) == 8L) // u2 = u2_den
    assert(r.getLong(5) == 1000000L)
    // identical distributions across the cut: exactly 1/2
    val ev2 = events(
      (1L, 0, 1L, "v", 0.01), (2L, 1, 1L, "v", 0.02),
      (3L, 2, 1L, "v", 0.01), (4L, 3, 1L, "v", 0.02))
    val Array(r2) = TimeSeries.mannWhitneyDrift(ev2, cut).collect()
    assert(r2.getLong(3) * 2 == r2.getLong(4)) // U = n1*n2/2 via midranks
    assert(r2.getLong(5) == 500000L)
  }

  test("pettitt: level shift located exactly, degenerate series scores zero") {
    // [1,1,1,5,5,5]c: r2 = 4 for the 1s, 10 for the 5s; U =
    // -3,-6,-9,-6,-3,0 -> K = 9 at the third event (min 2)
    val ev = events(
      (1L, 0, 1L, "v", 0.01), (2L, 1, 1L, "v", 0.01),
      (3L, 2, 1L, "v", 0.01), (4L, 3, 1L, "v", 0.05),
      (5L, 4, 1L, "v", 0.05), (6L, 5, 1L, "v", 0.05))
    val Array(r) = TimeSeries.pettittChangepoint(ev).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (6L, 9L, 120000000L, -9L))
    // constant series: every U_t = 0, changepoint degenerates to the
    // earliest instant
    val flat = events(
      (1L, 0, 1L, "v", 0.02), (2L, 1, 1L, "v", 0.02),
      (3L, 2, 1L, "v", 0.02))
    val Array(f) = TimeSeries.pettittChangepoint(flat).collect()
    assert((f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3)) ==
      (3L, 0L, 0L, 0L))
  }

  test("concurrency records: half-open intervals — touching is not overlap") {
    // value=0.99 -> dur floor(59.4)+1 = 60 s: [0,60) ends exactly as
    // the next starts; the -1 sorts first, so concurrency never hits 2
    val ev = events(
      (1L, 0, 1L, "view", 0.99), (2L, 1, 1L, "view", 0.99))
    val got = TimeSeries.concurrencyRecords(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("bursts: spike above trailing average forms one interval, partial windows never alarm") {
    // hours 0..23: one event each (baseline); 24-25: two events
    // (flagged); 26: one event (trailing now includes the spike; not
    // flagged). Hours < 24 have partial windows and cannot alarm.
    val rows = (0 to 23).map(h => ((h + 1).toLong, h * 60, 1L, "v", 1.0)) ++
      Seq((100L, 24 * 60, 1L, "v", 1.0), (101L, 24 * 60 + 1, 1L, "v", 1.0),
        (102L, 25 * 60, 1L, "v", 1.0), (103L, 25 * 60 + 1, 1L, "v", 1.0),
        (104L, 26 * 60, 1L, "v", 1.0))
    val got = TimeSeries.bursts(events(rows: _*), num = 5, den = 4)
      .collect()
    assert(got.length == 1)
    val r = got.head
    // h24: s24=24, 2*96-24*5=72; h25: s24=25, 192-125=67 -> 139
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (24L, 25L, 2L, 2L, 139L))
  }

  test("spearman: monotone hourly series score +1, anti-monotone -1") {
    // hours 0/1/2 carry 1/2/3 events of 1c each: x=(1,2,3), y=(1,2,3)
    val up = events(
      (1L, 0, 1L, "v", 0.01),
      (2L, 60, 1L, "v", 0.01), (3L, 61, 1L, "v", 0.01),
      (4L, 120, 1L, "v", 0.01), (5L, 121, 1L, "v", 0.01),
      (6L, 122, 1L, "v", 0.01))
    val Array(r) = TimeSeries.spearmanHourly(up).collect()
    // doubled midranks (2,4,6): num = d1 = d2 = 24
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 24L, 24L, 24L))
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    // same x, y reversed (9c / 2c / 0c): perfect negative
    val down = events(
      (1L, 0, 1L, "v", 0.09),
      (2L, 60, 1L, "v", 0.01), (3L, 61, 1L, "v", 0.01),
      (4L, 120, 1L, "v", 0.00), (5L, 121, 1L, "v", 0.00),
      (6L, 122, 1L, "v", 0.00))
    val Array(r2) = TimeSeries.spearmanHourly(down).collect()
    assert(math.abs(r2.getDouble(4) + 1.0) < 1e-12)
  }

  test("pettitt segments: two level shifts found by recursive split, per-segment midranks") {
    // [1,1,5,5,9,9]c: global U = -4,-8,-8,-8,-4,0 -> K=8 at t2 (earliest);
    // left [1,1] constant -> K=0 at its first row; right [5,5,9,9]
    // re-ranked WITHIN the segment -> U = -2,-4,-2,0 -> K=4 at event 4
    val ev = events(
      (1L, 0, 1L, "v", 0.01), (2L, 1, 1L, "v", 0.01),
      (3L, 2, 1L, "v", 0.05), (4L, 3, 1L, "v", 0.05),
      (5L, 4, 1L, "v", 0.09), (6L, 5, 1L, "v", 0.09))
    val got = TimeSeries.pettittSegments(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("all") == (6L, 8L, 60000000L, -8L))
    assert(got("left") == (2L, 0L, 0L, 0L))
    assert(got("right") == (4L, 4L, 180000000L, -4L))
  }

  test("gap burstiness: metronome scores 0, a 1:3 gap pair scores exactly 1/4") {
    val ev = events(
      // user 1: gaps (60s, 60s, 60s) -> variance 0
      (1L, 0, 1L, "v", 1.0), (2L, 1, 1L, "v", 1.0),
      (3L, 2, 1L, "v", 1.0), (4L, 3, 1L, "v", 1.0),
      // user 2: gaps (60s, 180s): CV^2 = (2*10 - 16)/16 = 1/4
      (5L, 0, 2L, "v", 1.0), (6L, 1, 2L, "v", 1.0), (7L, 4, 2L, "v", 1.0))
    val got = TimeSeries.gapBurstiness(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(2) == 0L && got(1L).getDouble(3) == 0.0)
    assert(got(2L).getLong(2) == 250000L && got(2L).getDouble(3) == 0.25)
    // all events at one instant: zero gap sum degrades to NULL
    val same = events((1L, 0, 9L, "v", 1.0), (2L, 0, 9L, "v", 1.0))
    val Array(z) = TimeSeries.gapBurstiness(same).collect()
    assert(z.isNullAt(2) && z.isNullAt(3))
  }

  test("interval overlap: bucket decomposition equals brute force, pairs count once") {
    // value v -> duration (floor(v*60)+1) s. Buckets are 60 s, so a
    // pair sharing TWO buckets (users 1 & 3 overlap [0s, 91s)) proves
    // the canonical-bucket rule: n_pairs stays 1, never 2.
    val ev = events(
      (1L, 0, 1L, "v", 1.5),  // user 1: [0, 91s)   buckets 0,1
      (2L, 1, 2L, "v", 0.5),  // user 2: [60, 91s)  bucket 1
      (3L, 0, 3L, "v", 2.0),  // user 3: [0, 121s)  buckets 0,1,2
      (4L, 3, 1L, "v", 0.01)) // user 1 again: [180, 181s) — overlaps no one
    val got = TimeSeries.intervalOverlap(ev).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // driver-side brute force over the same derivation
    def iv(min: Int, v: Double) =
      (min * 60000000L, min * 60000000L + (math.floor(v * 60).toLong + 1) * 1000000L)
    val all = Seq((1L, iv(0, 1.5)), (2L, iv(1, 0.5)), (3L, iv(0, 2.0)),
      (1L, iv(3, 0.01)))
    val brute = (for {
      (ua, (sa, ea)) <- all; (ub, (sb, eb)) <- all
      if ua < ub && sa < eb && sb < ea
    } yield ((ua, ub), math.min(ea, eb) - math.max(sa, sb)))
      .groupBy(_._1)
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    assert(got == brute)
    assert(got((1L, 3L))._1 == 1L && got((1L, 3L))._2 == 91000000L)
  }

  test("seasonal strength: planted daily cycle scores 0, constant series NULL") {
    // 48 hours, count 5 at hours 0 and 24, else 1: the second day
    // repeats the first exactly, so seasonal errors are 0 while the
    // naive forecast pays at every day-boundary step
    var id = 0L
    val rows = (0 until 48).flatMap { h =>
      val n = if (h % 24 == 0) 5 else 1
      (0 until n).map { _ => id += 1; (id, h * 60, 1L, "v", 1.0) }
    }
    val Array(r) = TimeSeries.seasonalStrength(events(rows: _*)).collect()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (48L, 47L, 24L))
    assert(r.getLong(3) == 12L && r.getLong(4) == 0L)
    assert(r.getLong(5) == 0L, "perfect daily repetition: ratio 0 ppm")
    // constant series: nothing to forecast, ratio degrades to NULL
    val flat = events((1L, 0, 1L, "v", 1.0), (2L, 60, 1L, "v", 1.0))
    val Array(f) = TimeSeries.seasonalStrength(flat).collect()
    assert(f.getLong(3) == 0L && f.isNullAt(5))
    // calendar gap: the hour after a missing hour contributes no term
    val gap = events((1L, 0, 1L, "v", 1.0), (2L, 120, 1L, "v", 1.0))
    val Array(g) = TimeSeries.seasonalStrength(gap).collect()
    assert((g.getLong(0), g.getLong(1)) == (2L, 0L))
  }

  test("interval overlap: half-open touching intervals never pair") {
    val ev = events(
      (1L, 0, 1L, "v", 0.99), // [0, 60s) — floor(59.4)+1 = 60
      (2L, 1, 2L, "v", 0.5))  // [60s, 91s) — touches, must not pair
    assert(TimeSeries.intervalOverlap(ev).count() == 0)
  }

  test("spearman: constant series degrades to null rho, never a crash") {
    // one event per hour, identical values: both rank variances are 0
    val flat = events(
      (1L, 0, 1L, "v", 0.05), (2L, 60, 1L, "v", 0.05),
      (3L, 120, 1L, "v", 0.05))
    val Array(r) = TimeSeries.spearmanHourly(flat).collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (0L, 0L, 0L))
    assert(r.isNullAt(4))
  }
}
