package graft.analyze
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{AsOfJoin, ZOrder}

/** Operator-inventory extensions beyond the reference surface: as-of
  * join (union + running-window formulation), interval/range self-join
  * (bucket-blocked), and TF-IDF-style term scoring (with a
  * multiplication-only idf so both engines produce identical doubles).
  */
object OpQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  /** The item-transition edge list both graph queries share: per-user
    * consecutive prop-k values ordered by (ts, event_id), weighted by
    * transition count.
    */
  private def eventEdges(s: SparkSession, d: String): DataFrame =
    eventEdgesOf(t(s, d, "events"))

  /** [[eventEdges]] over an arbitrary slice of the events table (the
    * g25 incremental twin splits by user cohort — transitions are
    * per-user windows, so filtering users commutes with the lag).
    */
  private def eventEdgesOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("src", lag(col("k"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src").cast("long").as("src"),
        col("k").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** DuckDB twin of [[eventEdges]] as CTEs ending in `ed(src, dst, w)`. */
  private val eventEdgesCtes: String = s"""
      ev AS (SELECT user_id, ts, event_id,
                    CAST(json_extract_string(props, '$$.k') AS INT) AS k
             FROM events
             WHERE json_extract_string(props, '$$.k') IS NOT NULL),
      tr AS (SELECT k, LAG(k) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS src FROM ev),
      ed AS (SELECT CAST(src AS BIGINT) AS src, CAST(k AS BIGINT) AS dst,
                    COUNT(*) AS w FROM tr WHERE src IS NOT NULL GROUP BY 1, 2)"""

  /** Deterministic top-`300`-weight backbone of [[eventEdges]] shared
    * by the HyperBall queries (the g17 convention: heavy transitions
    * keep the graph sparse enough for multi-hop structure to exist in
    * the near-complete test graph).
    */
  private def hbBackbone(s: SparkSession, d: String): DataFrame =
    eventEdges(s, d)
      .filter(col("src") =!= col("dst"))
      .orderBy(col("w").desc, col("src"), col("dst")).limit(300)
      .select(col("src"), col("dst"))

  /** DuckDB twin of [[graft.ext.Graphs.hyperBall]] (p = 6 hardwired:
    * bucket = hv >> 26, 26-bit rank word) over the top-`topE` backbone
    * of `ed`, unrolled to `maxT` max-merge rounds; ends in
    * `ball(t, k, ball)`.
    */
  private def hyperBallCtes(maxT: Int, topE: Int): String = {
    val iters = (1 to maxT).map { i =>
      s"""r$i AS MATERIALIZED (SELECT k, bucket, MAX(m_rho) AS m_rho FROM (
          SELECT k, bucket, m_rho FROM r${i - 1}
          UNION ALL
          SELECT e.src AS k, r${i - 1}.bucket, r${i - 1}.m_rho
          FROM edb e JOIN r${i - 1} ON r${i - 1}.k = e.dst) u
        GROUP BY k, bucket)"""
    }.mkString(",\n      ")
    // the linear-counting table literals are the SAME integers the
    // Spark operator bakes in (Graphs.linearCountTable) — ln() is
    // evaluated once in this JVM, never at query runtime
    val lcList = graft.ext.Graphs.linearCountTable(64).mkString("[", ", ", "]")
    val balls = (0 to maxT).map { t =>
      s"""SELECT $t AS t, k,
           CASE WHEN n_used < 64 AND raw <= CAST(160 AS DOUBLE)
                THEN list_extract($lcList, CAST(64 - n_used AS INT))
                ELSE CAST(FLOOR(raw) AS BIGINT) END AS ball
         FROM (SELECT k, COUNT(*) AS n_used,
                 (CAST(0.7213 AS DOUBLE)
                   / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE)))
                 * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE)
                 / (SUM(CAST(1 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << m_rho AS DOUBLE))
                    + (CAST(64 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))) AS raw
               FROM r$t GROUP BY k) x$t"""
    }.mkString(" UNION ALL ")
    s"""edb AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT $topE)),
      hbn AS (SELECT DISTINCT k FROM
                (SELECT src AS k FROM edb UNION SELECT dst FROM edb) u),
      hbh AS (SELECT k,
                CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
                  AS hv
              FROM hbn),
      hbb AS (SELECT k, hv >> 26 AS bucket, hv & 67108863 AS w FROM hbh),
      hs1 AS (SELECT k, bucket, w | (w >> 1) AS v FROM hbb),
      hs2 AS (SELECT k, bucket, v | (v >> 2) AS v FROM hs1),
      hs4 AS (SELECT k, bucket, v | (v >> 4) AS v FROM hs2),
      hs8 AS (SELECT k, bucket, v | (v >> 8) AS v FROM hs4),
      hs16 AS (SELECT k, bucket, v | (v >> 16) AS v FROM hs8),
      r0 AS MATERIALIZED (SELECT k, bucket, MAX(27 - bit_count(v)) AS m_rho
                          FROM hs16 GROUP BY k, bucket),
      $iters,
      ball AS ($balls)"""
  }

  /** Unrolled synchronous label propagation as CTEs over the shared
    * `ed(src, dst, w)` list: symmetrize (`sym`), seed labels with node
    * ids (`l0`), then `iters` argmax-neighbor-label rounds ending in
    * `l$iters(k, label)` — the DuckDB twin of
    * [[graft.ext.Graphs.labelPropagation]], shared by g04 and g12.
    */
  private def lpaCtes(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""s$i AS (SELECT sym.src, l${i - 1}.label AS nl, SUM(sym.w) AS s
              FROM sym JOIN l${i - 1} ON l${i - 1}.k = sym.dst
              GROUP BY sym.src, l${i - 1}.label),
        p$i AS (SELECT src, nl, ROW_NUMBER() OVER (PARTITION BY src
                  ORDER BY s DESC, nl) AS rn FROM s$i),
        l$i AS (SELECT l${i - 1}.k, COALESCE(p$i.nl, l${i - 1}.label) AS label
                FROM l${i - 1} LEFT JOIN p$i
                  ON p$i.src = l${i - 1}.k AND p$i.rn = 1)"""
    }.mkString(",\n        ")
    s"""sym AS (SELECT src, dst, SUM(w) AS w FROM (
                SELECT src, dst, w FROM ed WHERE src <> dst
                UNION ALL
                SELECT dst, src, w FROM ed WHERE src <> dst) u
              GROUP BY src, dst),
      nodes AS (SELECT DISTINCT src AS k FROM sym),
      l0 AS (SELECT k, k AS label FROM nodes),
      $iterCtes"""
  }

  /** Unrolled k-core peel as CTEs over the shared `ed(src, dst, w)`
    * edge list: `{pfx}e0` is the undirected simple graph, each round i
    * drops nodes whose surviving degree < minDeg and restricts edges
    * to survivors, ending in `{pfx}e$rounds` — the DuckDB twin of
    * [[graft.ext.Graphs.kCore]]'s loop body.
    */
  private def kcorePeelCtes(minDeg: Int, rounds: Int, pfx: String): String = {
    val roundCtes = (1 to rounds).map { i =>
      s"""${pfx}kp$i AS (SELECT k FROM (
              SELECT k, COUNT(*) AS deg FROM (
                SELECT a AS k FROM ${pfx}e${i - 1}
                UNION ALL SELECT b FROM ${pfx}e${i - 1}) u
              GROUP BY k) z WHERE deg >= $minDeg),
      ${pfx}e$i AS (SELECT a, b FROM ${pfx}e${i - 1}
              WHERE a IN (SELECT k FROM ${pfx}kp$i)
                AND b IN (SELECT k FROM ${pfx}kp$i))"""
    }.mkString(",\n      ")
    s"""${pfx}e0 AS (SELECT DISTINCT LEAST(src, dst) AS a,
             GREATEST(src, dst) AS b FROM ed WHERE src <> dst),
      $roundCtes"""
  }

  /** Unrolled-Lloyd DuckDB twin of [[graft.ext.Similarity.kmeansFit]]:
    * per iteration, a distance cross-join to the current centroid rows,
    * a row_number()-over-(dist2, c_id) assignment, and a fixed-point
    * (floor(x*2^40) BIGINT sum) centroid mean — the same arithmetic,
    * in the same order, as the Spark side. Mirrors the engine's
    * training-sample rule too: rounds aggregate over the hash-sampled
    * `tvecs` (modulus derived from the oracle's own COUNT(*) and the
    * shared [[graft.ext.Similarity.DefaultTrainCap]]), seeds are the k
    * smallest by (h32(vec_id), vec_id), and only the final assignment
    * reads every vector.
    */
  private def kmeansCtes(pfx: String, vecExpr: String,
                         k: Int, iters: Int,
                         src: String = "embeddings"): String = {
    val Q = "CAST(1099511627776 AS DOUBLE)" // 2^40
    val cap = graft.ext.Similarity.DefaultTrainCap
    val idH = graft.functions.Hashing.h32Sql("CAST(vec_id AS VARCHAR)")
    def dist2(v: String, c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(len($v)), i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1]))), " +
        "(acc, e) -> acc + e)"
    def assignCte(i: Int, cents: String, src: String) = s"""
      ${pfx}d$i AS (SELECT vec_id, v, c_id, ${dist2("v", "c")} AS dist2
              FROM ${pfx}$src CROSS JOIN $cents),
      ${pfx}a$i AS (SELECT vec_id, v, c_id AS cluster, dist2
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY dist2, c_id) AS rn FROM ${pfx}d$i)
              WHERE rn = 1)"""
    def updateCte(i: Int) = s"""
      ${pfx}e$i AS (SELECT cluster, UNNEST(range(len(v))) AS d, UNNEST(v) AS x
              FROM ${pfx}a$i),
      ${pfx}s$i AS (SELECT cluster, d,
                CAST(SUM(CAST(floor(x * $Q) AS BIGINT)) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE) / $Q AS m
              FROM ${pfx}e$i GROUP BY cluster, d),
      ${pfx}c$i AS (SELECT cluster AS c_id, list(m ORDER BY d) AS c
              FROM ${pfx}s$i GROUP BY cluster)"""
    // iters = 0 (assignment under the raw init, as kmeansFit supports)
    // must not leave a dangling comma where the rounds would go
    val rounds = (1 to iters)
      .map(i => assignCte(i, s"${pfx}c${i - 1}", "tvecs") + "," + updateCte(i))
      .mkString(",")
    val roundsSeg = if (rounds.isEmpty) "" else s"$rounds,"
    s"""${pfx}vecs AS (SELECT vec_id,
           list_transform($vecExpr, x -> CAST(x AS DOUBLE)) AS v
         FROM $src),
    ${pfx}m AS (SELECT GREATEST(CAST(1 AS BIGINT),
           CAST(ceil(CAST(COUNT(*) AS DOUBLE) / $cap) AS BIGINT)) AS md
         FROM ${pfx}vecs),
    ${pfx}tvecs AS (SELECT vec_id, v FROM ${pfx}vecs
         WHERE $idH % (SELECT md FROM ${pfx}m) = 0),
    ${pfx}c0 AS (SELECT vec_id AS c_id, v AS c FROM (
           SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY $idH, vec_id) AS rn
           FROM ${pfx}tvecs) WHERE rn <= $k),
    $roundsSeg
    ${assignCte(iters + 1, s"${pfx}c$iters", "vecs")}"""
  }

  private def kmeansOracle(k: Int, iters: Int): String = s"""
    WITH ${kmeansCtes("", "embedding", k, iters)}
    SELECT vec_id, cluster, dist2 FROM a${iters + 1} ORDER BY vec_id"""

  /** SemDeDup twin: the [[kmeansCtes]] assignment is the blocking key;
    * pairs join within a cluster, cosine is the shared float->double
    * fold, and the drop rule (nearer-to-centroid loses, ties drop the
    * larger id) compares the same bit-exact dist2 values as the engine.
    */
  private def semDedupOracle(k: Int, iters: Int, threshold: Double): String = s"""
    WITH ${kmeansCtes("", "embedding", k, iters)},
    e AS (SELECT vec_id, embedding,
                 ${graft.ext.Similarity.normSql("embedding")} AS nrm FROM embeddings),
    j AS (SELECT t.vec_id, t.cluster, t.dist2, e.embedding, e.nrm
          FROM a${iters + 1} t JOIN e USING (vec_id)),
    p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.cluster AS cluster,
                 ${graft.ext.Similarity.dotSql("x.embedding", "y.embedding")}
                   / (x.nrm * y.nrm) AS cosine,
                 x.dist2 AS da, y.dist2 AS db
          FROM j x JOIN j y ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
    SELECT vec_a, vec_b, cluster, cosine,
           CASE WHEN da < db THEN vec_a WHEN db < da THEN vec_b
                ELSE GREATEST(vec_a, vec_b) END AS drop_id
    FROM p WHERE cosine >= $threshold ORDER BY vec_a, vec_b"""

  /** PQ oracle: one [[kmeansCtes]] chain per subspace over
    * list_slice'd vectors, joined on vec_id; code is the comma-joined
    * cluster ids, recon_err the left-assoc sum of subspace residuals —
    * mirrors Similarity.pqEncode exactly.
    */
  private def pqOracle(nSub: Int, dims: Int, k: Int, iters: Int): String = {
    val sub = dims / nSub
    val chains = (0 until nSub).map { s =>
      kmeansCtes(s"p${s}_", s"list_slice(embedding, ${s * sub + 1}, ${(s + 1) * sub})",
        k, iters)
    }.mkString(",\n")
    val outs = (0 until nSub).map(s => s"p${s}_a${iters + 1}")
    val joins = outs.zipWithIndex.map { case (o, s) => s"$o p$s" }
      .reduceLeft((a, b) => s"$a JOIN $b USING (vec_id)")
    val code = (0 until nSub).map(s => s"CAST(p$s.cluster AS VARCHAR)")
      .reduceLeft((a, b) => s"$a || ',' || $b")
    val err = (0 until nSub).map(s => s"p$s.dist2").reduceLeft((a, b) => s"($a + $b)")
    s"""
    WITH $chains
    SELECT vec_id, $code AS code, $err AS recon_err
    FROM $joins ORDER BY vec_id"""
  }

  /** ADC oracle: per subspace, a query-side distance table (cross join
    * of sliced queries with the trained centroid rows) attached to
    * target codes by centroid id; subspace partials join on (query,
    * target) and sum left-assoc — mirrors Similarity.pqAdcTopK.
    */
  private def pqAdcOracle(nSub: Int, dims: Int, k: Int, iters: Int,
                          nQ: Int, topK: Int): String = {
    val sub = dims / nSub
    def dist2(v: String, c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(len($v)), i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1]))), " +
        "(acc, e) -> acc + e)"
    val chains = (0 until nSub).map { s =>
      kmeansCtes(s"p${s}_",
        s"list_slice(embedding, ${s * sub + 1}, ${(s + 1) * sub})", k, iters)
    }.mkString(",\n")
    val partCtes = (0 until nSub).map { s =>
      s"""part$s AS (
        SELECT l.q_id, a.vec_id AS t_id, l.d$s
        FROM (SELECT q.vec_id AS q_id, c.c_id AS cid,
                     ${dist2("q.v", "c.c")} AS d$s
              FROM p${s}_vecs q CROSS JOIN p${s}_c$iters c
              WHERE q.vec_id < $nQ) l
        JOIN p${s}_a${iters + 1} a
          ON a.cluster = l.cid AND a.vec_id >= $nQ)"""
    }.mkString(",\n")
    val joins = (0 until nSub).map(s => s"part$s")
      .reduceLeft((a, b) => s"$a JOIN $b USING (q_id, t_id)")
    val adc = (0 until nSub).map(s => s"d$s").reduceLeft((a, b) => s"($a + $b)")
    s"""
    WITH $chains,
    $partCtes,
    scored AS (SELECT q_id, t_id, $adc AS adc_dist FROM $joins),
    ranked AS (SELECT q_id, t_id, adc_dist,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc_dist, t_id) AS rn
               FROM scored)
    SELECT q_id AS query_id, t_id AS neighbor_id,
           adc_dist, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= $topK ORDER BY query_id, rn"""
  }

  /** IVF-PQ oracle (residual/IVFADC form): the coarse kmeans chain
    * assigns target cells and ranks each query's probe cells; targets
    * get a residual vector against their own cell's centroid and the
    * subspace chains train/encode over THOSE (src = tres); queries get
    * one residual per probed cell, so the ADC tables are keyed
    * (q_id, cell, cid); candidates are the cell equi-join and the
    * per-subspace parts are summed left-assoc — mirrors
    * Similarity.ivfPqTopK exactly.
    */
  private def ivfPqOracle(nCells: Int, nProbe: Int, nSub: Int, dims: Int,
                          k: Int, iters: Int, nQ: Int, topK: Int): String = {
    val sub = dims / nSub
    val I = iters + 1
    def dist2(v: String, c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(len($v)), i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1]))), " +
        "(acc, e) -> acc + e)"
    val coarse = kmeansCtes("c_", "embedding", nCells, iters)
    val resCtes = s"""
    tres AS (SELECT a.vec_id, a.cluster AS cell,
               list_transform(range(len(a.v)), i -> a.v[i+1] - c.c[i+1]) AS rv
             FROM c_a$I a JOIN c_c$iters c ON c.c_id = a.cluster
             WHERE a.vec_id >= $nQ),
    qcell AS (SELECT q_id, cell FROM (
        SELECT q.vec_id AS q_id, c.c_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ${dist2("q.v", "c.c")}, c.c_id) AS crn
        FROM c_vecs q CROSS JOIN c_c$iters c WHERE q.vec_id < $nQ)
      WHERE crn <= $nProbe),
    qres AS (SELECT qc.q_id, qc.cell,
               list_transform(range(len(q.v)), i -> q.v[i+1] - c.c[i+1]) AS rv
             FROM qcell qc
             JOIN c_vecs q ON q.vec_id = qc.q_id
             JOIN c_c$iters c ON c.c_id = qc.cell),
    cand AS (SELECT r.q_id, t.vec_id AS t_id, r.cell
             FROM qres r JOIN tres t ON t.cell = r.cell)"""
    val chains = (0 until nSub).map { s =>
      kmeansCtes(s"p${s}_",
        s"list_slice(rv, ${s * sub + 1}, ${(s + 1) * sub})", k, iters,
        src = "tres")
    }.mkString(",\n")
    val lutCtes = (0 until nSub).map { s =>
      s"""lut$s AS (
        SELECT r.q_id, r.cell, cc.c_id AS cid,
               ${dist2(s"list_slice(r.rv, ${s * sub + 1}, ${(s + 1) * sub})", "cc.c")} AS d$s
        FROM qres r CROSS JOIN p${s}_c$iters cc)"""
    }.mkString(",\n")
    val partCtes = (0 until nSub).map { s =>
      s"""part$s AS (
        SELECT cand.q_id, cand.t_id, l.d$s
        FROM cand
        JOIN p${s}_a$I a ON a.vec_id = cand.t_id
        JOIN lut$s l
          ON l.q_id = cand.q_id AND l.cell = cand.cell AND l.cid = a.cluster)"""
    }.mkString(",\n")
    val joins = (0 until nSub).map(s => s"part$s")
      .reduceLeft((a, b) => s"$a JOIN $b USING (q_id, t_id)")
    val adc = (0 until nSub).map(s => s"d$s").reduceLeft((a, b) => s"($a + $b)")
    s"""
    WITH $coarse,
    $resCtes,
    $chains,
    $lutCtes,
    $partCtes,
    scored AS (SELECT q_id, t_id, $adc AS adc_dist FROM $joins),
    withcell AS (SELECT s.q_id, s.t_id, c.cell, s.adc_dist
                 FROM scored s JOIN cand c USING (q_id, t_id)),
    ranked AS (SELECT q_id, t_id, cell, adc_dist,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc_dist, t_id) AS rn
               FROM withcell)
    SELECT q_id AS query_id, t_id AS neighbor_id, cell,
           adc_dist, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= $topK ORDER BY query_id, rn"""
  }

  val defs: Seq[(String, QFn, Option[String])] = Seq(

    // ---- UNION ALL with provenance tags ------------------------------
    ("q41_union_all_tagged", (s: SparkSession, d: String) => {
      val c = t(s, d, "customer").select(col("c_name").as("name"),
        lit("customer").as("kind"))
      val su = t(s, d, "supplier").select(col("s_name").as("name"),
        lit("supplier").as("kind"))
      c.unionAll(su).groupBy(col("kind")).agg(count(lit(1)).as("n"))
        .orderBy(col("kind"))
    }, Some("""
      SELECT kind, COUNT(*) AS n FROM (
        SELECT c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_name AS name, 'supplier' AS kind FROM supplier) u
      GROUP BY kind ORDER BY kind""")),

    // ---- LIMIT/OFFSET pagination -------------------------------------
    ("q42_limit_offset", (s: SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""")
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""")),

    // ---- LIKE / regexp predicates ------------------------------------
    ("q46_like_patterns", (s: SparkSession, d: String) => {
      t(s, d, "part").agg(
        count(when(col("p_name").like("%bolt%"), 1)).as("n_bolt"),
        count(when(col("p_name").like("blue%"), 1)).as("n_blue_prefix"),
        count(when(col("p_name").rlike("^(red|green) "), 1)).as("n_red_green"),
        count(when(col("p_type").like("%ECO%"), 1)).as("n_eco"))
    }, Some("""
      SELECT COUNT(CASE WHEN p_name LIKE '%bolt%' THEN 1 END) AS n_bolt,
             COUNT(CASE WHEN p_name LIKE 'blue%' THEN 1 END) AS n_blue_prefix,
             COUNT(CASE WHEN regexp_matches(p_name, '^(red|green) ') THEN 1 END) AS n_red_green,
             COUNT(CASE WHEN p_type LIKE '%ECO%' THEN 1 END) AS n_eco
      FROM part""")),

    // ---- windowed distinct aggregation -------------------------------
    ("w05_hourly_distinct_users", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"),
          col("n_users"), col("n_events"))
        .orderBy(col("window_start"))
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events GROUP BY 1 ORDER BY window_start""")),

    // ---- windowed heavy hitters: top-5 trending prop values per hour.
    // Two partial-aggregable stages: exact (window, k) counts, then the
    // map-side TopKAggregator per window — the exchange never carries
    // more than windows x 5 candidate rows however hot one value gets
    // (the exact-count companion of the t09 count-min sketch) ----------
    ("w09_trending_props", (s: SparkSession, d: String) => {
      val topk = graft.functions.TopKAggregator.topK(5)
      t(s, d, "events")
        .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("window_start"), col("k"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("window_start"))
        .agg(topk(col("k").cast("long"), col("n").cast("double")).as("sel"))
        .select(col("window_start"), posexplode(col("sel")).as(Seq("idx", "s")))
        .select(col("window_start"), col("s.id").cast("int").as("k"),
          col("s.score").cast("long").as("n"),
          (col("idx") + 1).cast("int").as("rk"))
        .orderBy(col("window_start"), col("rk"))
    }, Some("""
      WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                        CAST(json_extract_string(props, '$.k') AS INT) AS k,
                        COUNT(*) AS n
                 FROM events GROUP BY 1, 2)
      SELECT window_start, k, CAST(n AS BIGINT) AS n, CAST(rn AS INT) AS rk
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
              ORDER BY n DESC, k) AS rn FROM c) z
      WHERE rn <= 5 ORDER BY window_start, rk""")),

    // ---- graph-health audit (the s15 pattern for graphs): per-node
    // weighted degrees + dangling flag + broadcast one-row totals —
    // what pageRank's mass-drop note quantifies per corpus ------------
    ("g02_degree_audit", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.degreeAudit(eventEdges(s, d))
    }, Some(s"""
      WITH $eventEdgesCtes,
      o AS (SELECT src AS k, CAST(SUM(w) AS BIGINT) AS out_w,
                   CAST(COUNT(*) AS BIGINT) AS out_deg FROM ed GROUP BY src),
      i AS (SELECT dst AS k, CAST(SUM(w) AS BIGINT) AS in_w,
                   CAST(COUNT(*) AS BIGINT) AS in_deg FROM ed GROUP BY dst),
      tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                    CAST(SUM(w) AS BIGINT) AS total_w FROM ed)
      SELECT COALESCE(o.k, i.k) AS k,
             COALESCE(out_w, 0) AS out_w, COALESCE(out_deg, 0) AS out_deg,
             COALESCE(in_w, 0) AS in_w, COALESCE(in_deg, 0) AS in_deg,
             COALESCE(out_deg, 0) = 0 AS dangling,
             (SELECT n_edges FROM tt) AS n_edges,
             (SELECT total_w FROM tt) AS total_w
      FROM o FULL OUTER JOIN i ON o.k = i.k
      ORDER BY k""")),

    // ---- cohort retention: users grouped by first-seen day, counted
    // on each later active day. Two partial-aggregable aggregations
    // (first-touch per user; distinct user-days) joined on user_id —
    // co-partitioned after the first shuffle, no window, no
    // per-user event arrays; counts are exact integers ---------------
    ("w12_cohort_retention", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      val active = ev.distinct()
      active.join(cohorts, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("offset_days"))
    }, Some("""
      WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
      cohorts AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, day FROM ev)
      SELECT c.cohort,
             CAST(date_diff('day', c.cohort, a.day) AS INT) AS offset_days,
             CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
      FROM active a JOIN cohorts c ON a.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort, offset_days""")),

    // ---- SCD2 / CDC history build: collapse the per-user event stream
    // into slowly-changing-dimension validity intervals for the tracked
    // attribute (props.k). Change rows survive a per-user lag()
    // comparison; valid_to = the next change's timestamp (NULL = the
    // open current version). Both windows are PARTITIONED BY user_id —
    // per-key state only, no global sort, scale-safe; ties break on
    // event_id so the interval chain is deterministic ------------------
    ("w16_scd2_intervals", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k").isNotNull)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = ev.withColumn("prev_k", lag(col("k"), 1).over(w))
        .filter(col("prev_k").isNull || col("prev_k") =!= col("k"))
      changes
        .withColumn("version_no", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version_no"), col("k"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy(col("user_id"), col("version_no"))
    }, Some("""
      WITH ev AS (SELECT user_id, ts, event_id,
                    CAST(json_extract_string(props, '$.k') AS INT) AS k
                  FROM events
                  WHERE json_extract_string(props, '$.k') IS NOT NULL),
      lg AS (SELECT *, LAG(k) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_k FROM ev),
      ch AS (SELECT * FROM lg WHERE prev_k IS NULL OR prev_k <> k)
      SELECT user_id,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no, k,
             ts AS valid_from, LEAD(ts) OVER w AS valid_to
      FROM ch
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version_no""")),

    // ---- link-graph centrality: fixed-point PageRank over the item
    // transition graph (per-user consecutive prop-k values). The
    // corpus-curation quality-prior shape: edges from behavior, 3 exact
    // integer iterations, every rank a value-verifiable BIGINT. Oracle
    // = the same three iterations unrolled as CTEs ---------------------
    ("g01_pagerank", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.pageRank(eventEdges(s, d), iters = 3)
        .select(col("k"), col("r").as("rank_fp"))
    }, Some {
      val scale = 1L << 40
      val iterCtes = (1 to 3).map { i =>
        s"""c$i AS (SELECT ed.dst, SUM(r${i - 1}.r * ed.w // ow.ow) AS s
              FROM ed JOIN ow ON ed.src = ow.src
              JOIN r${i - 1} ON r${i - 1}.k = ed.src GROUP BY ed.dst),
        r$i AS (SELECT nodes.k,
                  (15 * $scale // 100) // (SELECT n FROM nn)
                    + 85 * COALESCE(c$i.s, 0) // 100 AS r
                FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.k)"""
      }.mkString(",\n        ")
      s"""
      WITH $eventEdgesCtes,
      ow AS (SELECT src, SUM(w) AS ow FROM ed GROUP BY src),
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT k, $scale // (SELECT n FROM nn) AS r FROM nodes),
      $iterCtes
      SELECT k, CAST(r AS BIGINT) AS rank_fp FROM r3 ORDER BY k"""
    }),

    // personalized PageRank (random walk with restart): teleport mass
    // confined to the seed set k <= 2 — g01's integer fixed point with
    // a seed-conditional teleport term, unrolled identically in SQL
    ("g11_personalized_pagerank", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      // checkpoint the derivation at the CALL SITE: the seed scan and
      // the operator's internal edge materialization otherwise each
      // re-run the json-parse + window + groupBy pipeline (the g12/g13
      // sharing discipline)
      val ed = eventEdges(s, d).cpGuard()
      val seeds = ed.select(col("src").as("k"))
        .union(ed.select(col("dst").as("k")))
        .distinct().filter(col("k") <= 2)
      Graphs.personalizedPageRank(ed, seeds, iters = 3)
        .select(col("k"), col("is_seed"), col("r").as("rank_fp"))
    }, Some {
      val scale = 1L << 40
      val tele = s"(15 * $scale // 100) // (SELECT n FROM nsd)"
      val iterCtes = (1 to 3).map { i =>
        s"""c$i AS (SELECT ed.dst, SUM(r${i - 1}.r * ed.w // ow.ow) AS s
              FROM ed JOIN ow ON ed.src = ow.src
              JOIN r${i - 1} ON r${i - 1}.k = ed.src GROUP BY ed.dst),
        r$i AS (SELECT nodes.k,
                  CASE WHEN nodes.k <= 2 THEN $tele ELSE 0 END
                    + 85 * COALESCE(c$i.s, 0) // 100 AS r
                FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.k)"""
      }.mkString(",\n        ")
      s"""
      WITH $eventEdgesCtes,
      ow AS (SELECT src, SUM(w) AS ow FROM ed GROUP BY src),
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      nsd AS (SELECT COUNT(*) AS n FROM nodes WHERE k <= 2),
      r0 AS (SELECT k, CASE WHEN k <= 2
                    THEN $scale // (SELECT n FROM nsd) ELSE 0 END AS r
             FROM nodes),
      $iterCtes
      SELECT k, k <= 2 AS is_seed, CAST(r AS BIGINT) AS rank_fp
      FROM r3 ORDER BY k"""
    }),

    // ---- HITS hubs & authorities over the same event transition
    // graph: g01's fixed-point discipline with max-renormalization by
    // integer division (portable stand-in for the L2 normalize — HITS
    // scores are only meaningful up to a per-vector constant). Two
    // exact unrolled iterations; aggregator pages score as hubs,
    // canonical destinations as authorities -------------------------
    ("g08_hits", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.hits(eventEdges(s, d), iters = 2)
    }, Some {
      val scale = 1L << 20
      val iterCtes = (1 to 2).map { i =>
        s"""a${i}r AS (SELECT nodes.k, COALESCE(sa.ar, 0) AS ar FROM nodes
              LEFT JOIN (SELECT ed.dst, SUM(ed.w * h${i - 1}.h) AS ar
                         FROM ed JOIN h${i - 1} ON h${i - 1}.k = ed.src
                         GROUP BY ed.dst) sa ON sa.dst = nodes.k),
        a$i AS (SELECT k, ar // GREATEST(CAST(1 AS BIGINT),
                  (SELECT MAX(ar) FROM a${i}r) // $scale) AS a FROM a${i}r),
        h${i}r AS (SELECT nodes.k, COALESCE(sh.hr, 0) AS hr FROM nodes
              LEFT JOIN (SELECT ed.src, SUM(ed.w * a$i.a) AS hr
                         FROM ed JOIN a$i ON a$i.k = ed.dst
                         GROUP BY ed.src) sh ON sh.src = nodes.k),
        h$i AS (SELECT k, hr // GREATEST(CAST(1 AS BIGINT),
                  (SELECT MAX(hr) FROM h${i}r) // $scale) AS h FROM h${i}r)"""
      }.mkString(",\n        ")
      s"""
      WITH $eventEdgesCtes,
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      h0 AS (SELECT k, CAST($scale AS BIGINT) AS h FROM nodes),
      $iterCtes
      SELECT a2.k, CAST(a2.a AS BIGINT) AS auth_fp, CAST(h2.h AS BIGINT) AS hub_fp
      FROM a2 JOIN h2 ON a2.k = h2.k ORDER BY a2.k"""
    }),

    // ---- link prediction over the same undirected transition graph:
    // common-neighbors + preferential-attachment for non-adjacent
    // pairs, wedge centers hot-capped at deg <= 85 (the sf0.01 fixture
    // has degrees 74..92, so the cap provably prunes — the capped
    // production path is itself the hash-verified path, the d31-d34
    // convention). Integer-only scores; global top-N is a TakeOrdered,
    // no window --------------------------------------------------------
    ("g09_link_prediction", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.linkPrediction(eventEdges(s, d), topN = 50, maxWedgeDeg = 85)
    }, Some(s"""
      WITH $eventEdgesCtes,
      und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM ed WHERE src <> dst),
      adj AS (SELECT a AS k, b AS n FROM und
              UNION ALL SELECT b AS k, a AS n FROM und),
      deg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      adjc AS (SELECT adj.n, adj.k FROM adj
               JOIN deg ON deg.k = adj.n WHERE deg.deg <= 85),
      cn AS (SELECT x.k AS a, y.k AS b, CAST(COUNT(*) AS BIGINT) AS cn
             FROM adjc x JOIN adjc y ON x.n = y.n AND x.k < y.k
             GROUP BY 1, 2),
      cand AS (SELECT cn.a, cn.b, cn.cn FROM cn
               WHERE NOT EXISTS (SELECT 1 FROM und
                                 WHERE und.a = cn.a AND und.b = cn.b)),
      sc AS (SELECT cand.a, cand.b, cand.cn, da.deg * db.deg AS pa
             FROM cand JOIN deg da ON da.k = cand.a
                       JOIN deg db ON db.k = cand.b)
      SELECT a, b, cn, pa FROM sc
      ORDER BY cn DESC, pa DESC, a, b LIMIT 50""")),

    // deterministic pseudo-random walks (the DeepWalk corpus step,
    // RNG-free): step t moves to the out-neighbor minimizing the
    // portable h32("v:t:u") — the oracle unrolls the three steps with
    // ROW_NUMBER-over-(h, dst) picks and must match node-for-node
    ("g10_random_walks", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.randomWalks(eventEdges(s, d), steps = 3)
    }, Some {
      def step(i: Int): String = s"""
      c${i + 1} AS (SELECT w$i.start, e.dst,
              ${graft.functions.Hashing.h32Sql(s"CAST(w$i.node AS VARCHAR) || ':$i:' || CAST(e.dst AS VARCHAR)")} AS h
             FROM w$i JOIN ed e ON w$i.node = e.src),
      w${i + 1} AS (SELECT start, dst AS node FROM (
              SELECT start, dst,
                     ROW_NUMBER() OVER (PARTITION BY start ORDER BY h, dst) AS rn
              FROM c${i + 1}) z WHERE rn = 1)"""
      s"""
      WITH $eventEdgesCtes,
      w0 AS (SELECT DISTINCT src AS start, src AS node FROM ed),
      ${(0 until 3).map(step).mkString(",")}
      SELECT start, CAST(step AS INT) AS step, node FROM (
        SELECT start, 0 AS step, node FROM w0
        UNION ALL SELECT start, 1, node FROM w1
        UNION ALL SELECT start, 2, node FROM w2
        UNION ALL SELECT start, 3, node FROM w3) u
      ORDER BY start, step"""
    }),

    // ---- bucketed co-located fact-fact join: both tables written
    // bucketed+sorted on the join key (Layout.writeBucketed, the
    // one-time pre-shuffle), so the sort-merge join itself plans with
    // ZERO Exchange — the only hash exchange left in the plan is the
    // tiny post-join rollup (LayoutSpec pins that count). At cluster
    // scale this converts the dominant recurring shuffle of a star
    // workload into a write-once cost; oracle is the plain join (the
    // layout is physical only) ----------------------------------------
    ("w17_bucketed_colocated_join", (s: SparkSession, d: String) => {
      import graft.operators.Layout
      val ot = "graft_bkt_orders_q"
      val lt = "graft_bkt_lineitem_q"
      Seq(ot, lt).foreach { tb =>
        s.sql(s"DROP TABLE IF EXISTS $tb")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/$tb")
        loc.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(loc, true)
      }
      // the two bucketed-table writes are independent write jobs —
      // overlap them (guide §2.6); each still writes exactly its table
      graft.core.Par.eval2(
        Layout.writeBucketed(t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
          ot, "o_orderkey", 8),
        Layout.writeBucketed(t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount")),
          lt, "l_orderkey", 8))
      s.table(ot).hint("merge")
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- Z-order data-skipping audit: the Delta/Iceberg OPTIMIZE
    // ZORDER BY decision, measured. Events map to a 10-bit x (event-id
    // bucket) x 10-bit y (minute-slot) grid; 64 simulated files per
    // layout; the box predicate is file-aligned so the headline reads
    // clean: z-order's interleaved leading bits pin BOTH dims (1 file
    // touched), linear-on-x pins one (8 files, 8x the scan). The
    // interleave is one shared bit plan rendered per engine — every
    // stat an exact integer ------------------------------------------
    ("w15_zorder_skipping", (s: SparkSession, d: String) => {
      val grid = t(s, d, "events").select(
        (col("event_id") % 1024).as("x"),
        expr("(unix_micros(ts) div 60000000) % 1024").as("y"))
      ZOrder.skippingAudit(grid, bits = 10, fileBits = 6,
        x0 = 256, x1 = 383, y0 = 512, y1 = 639)
    }, Some(s"""
      WITH base AS (SELECT CAST(event_id % 1024 AS BIGINT) AS x,
                           CAST((epoch_us(ts) // 60000000) % 1024 AS BIGINT) AS y
                    FROM events),
      zb AS (SELECT x, y,
                    CAST(${ZOrder.interleaveDuckSql("x", "y", 10)} AS BIGINT) AS z
             FROM base),
      tagged AS (SELECT 'zorder' AS layout, z >> 14 AS fid, x, y FROM zb
                 UNION ALL
                 SELECT 'linear' AS layout, x >> 4 AS fid, x, y FROM zb),
      pf AS (SELECT layout, fid,
                    MIN(x) AS min_x, MAX(x) AS max_x,
                    MIN(y) AS min_y, MAX(y) AS max_y,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN x BETWEEN 256 AND 383
                                   AND y BETWEEN 512 AND 639
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_match
             FROM tagged GROUP BY layout, fid)
      SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(CASE WHEN min_x <= 383 AND max_x >= 256
                            AND min_y <= 639 AND max_y >= 512
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
             CAST(SUM(CASE WHEN min_x <= 383 AND max_x >= 256
                            AND min_y <= 639 AND max_y >= 512
                      THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
             CAST(SUM(n_match) AS BIGINT) AS rows_matched
      FROM pf GROUP BY layout ORDER BY layout""")),

    // ---- w15's simulation made PHYSICAL: write the grid as real
    // z-ordered vs x-sorted parquet (64 files, one row group each),
    // push the same box predicate through Spark's scan, and read the
    // skipping off the scan's numOutputRows metric. Scanned-row counts
    // depend on range-partitioner sampling, so the output is matched-
    // data checksums (oracle-computed from events) plus engine-verified
    // pruning verdicts the oracle asserts TRUE (the m14/t36 pattern) --
    ("w46_zorder_pruned_scan", (s: SparkSession, d: String) => {
      val grid = t(s, d, "events").select(
        (col("event_id") % 1024).as("x"),
        expr("(unix_micros(ts) div 60000000) % 1024").as("y"))
      val dir = s.conf.get("spark.sql.warehouse.dir") +
        "/graft_zorder_layout_q"
      ZOrder.prunedScanAudit(grid, dir, bits = 10, nFiles = 64,
        x0 = 256, x1 = 383, y0 = 512, y1 = 639)
    }, Some("""
      WITH base AS (SELECT CAST(event_id % 1024 AS BIGINT) AS x,
                           CAST((epoch_us(ts) // 60000000) % 1024 AS BIGINT) AS y
                    FROM events)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_match,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(y) AS BIGINT) AS sum_y,
             TRUE AS layouts_agree, TRUE AS scan_sound,
             TRUE AS z_pruned, TRUE AS lin_pruned,
             TRUE AS z_beats_linear
      FROM base WHERE x BETWEEN 256 AND 383 AND y BETWEEN 512 AND 639""")),

    // ---- schema evolution made PHYSICAL: two parquet generations
    // (the later one adds a column) written side by side and read back
    // through mergeSchema — proving Spark's union-by-name fill (old
    // rows surface the new column as NULL) on real files, the way a
    // year of weekly drips actually looks at read time. Output is
    // per-generation counts and checksums the oracle recomputes from
    // events directly --------------------------------------------------
    ("w47_schema_evolution", (s: SparkSession, d: String) => {
      val dir = s.conf.get("spark.sql.warehouse.dir") + "/graft_schema_evo_q"
      val base = t(s, d, "events").select(col("event_id"), col("user_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      base.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("cents"))
        .write.mode("overwrite").parquet(s"$dir/g0")
      base.filter(col("event_id") % 2 === 1)
        .withColumn("segment", col("user_id") % 4)
        .write.mode("overwrite").parquet(s"$dir/g1")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$dir/g0", s"$dir/g1")
      merged.agg(
        count(lit(1)).as("n_total"),
        sum(when(col("segment").isNull, 1L).otherwise(0L)).as("n_old_gen"),
        sum(when(col("segment").isNotNull, 1L).otherwise(0L)).as("n_new_gen"),
        coalesce(sum(col("segment")), lit(0L)).as("sum_segment"),
        sum(col("cents")).as("sum_cents"))
    }, Some("""
      WITH b AS (SELECT event_id, user_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                 FROM events)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old_gen,
             CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_gen,
             CAST(SUM(CASE WHEN event_id % 2 = 1 THEN user_id % 4
                           ELSE 0 END) AS BIGINT) AS sum_segment,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM b""")),

    // ---- CSV corrupt-record quarantine: render the documents table
    // as real CSV with a deterministic slice made unparseable
    // (non-numeric in a BIGINT column), read back PERMISSIVE with a
    // corrupt-record column, and report clean/quarantined splits the
    // oracle recomputes from the plant rule — the don't-drop-data-
    // silently contract every 100 TB CSV ingest needs; a second
    // DROPMALFORMED read must agree with the clean count ---------------
    ("w48_csv_quarantine", (s: SparkSession, d: String) => {
      val dir = s.conf.get("spark.sql.warehouse.dir") + "/graft_csv_quar_q"
      t(s, d, "documents")
        .select(concat(
          col("doc_id"), lit(","), col("lang"), lit(","),
          when(col("doc_id") % 7 === 3,
            concat(lit("x"), col("n_chars")))
            .otherwise(col("n_chars").cast("string"))).as("value"))
        .write.mode("overwrite").text(dir)
      val schema = "doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING"
      // no cache: the PERMISSIVE read feeds exactly one aggregation, so
      // within a pass a cache buys nothing — and a persisted one leaks
      // ACROSS bench passes (the timed pass would read the warmup's
      // cache instead of re-parsing the CSV it just rewrote, flattering
      // the timing; the repeated "Asked to cache already cached data"
      // warnings in the r16 driver bench tail were this)
      val read = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(dir)
      // count(n_chars), not count(*): column pruning would otherwise
      // let the CSV reader skip parsing entirely and drop nothing
      val dropped = s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG")
        .option("mode", "DROPMALFORMED").csv(dir)
        .agg(count(col("n_chars")).as("n_dropmalformed"))
      read.agg(
        sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
          .as("n_quarantined"),
        coalesce(sum(when(col("_corrupt").isNull, col("n_chars"))), lit(0L))
          .as("sum_nchars_clean"),
        // quarantined rows must carry the raw line, never silent nulls
        sum(when(col("_corrupt").isNotNull &&
          col("_corrupt").contains(",x"), 1L).otherwise(0L))
          .as("n_quarantined_with_raw"))
        .crossJoin(broadcast(dropped))
    }, Some("""
      SELECT CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clean,
             CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined,
             CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN n_chars ELSE 0 END)
               AS BIGINT) AS sum_nchars_clean,
             CAST(SUM(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined_with_raw,
             CAST(SUM(CASE WHEN doc_id % 7 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropmalformed
      FROM documents""")),

    // ---- rank-based trimmed and winsorized means per user — the
    // robust aggregate family beside w13's median/MAD: drop (trimmed)
    // or clamp (winsorized) the bottom/top n div 10 values by exact
    // (cents, event_id) rank; every statistic is a BIGINT at 2^10
    // fixed point (sum * 1024 div count), no interpolation, no IEEE.
    // One user-partitioned rank window + one partial-aggregable
    // groupBy — the shape survives any corpus size ---------------------
    ("w49_robust_trim", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cents"), col("event_id"))
      val b = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("user_id"))))
        .withColumn("lo", expr("n div 10"))
        .withColumn("hi", col("n") - col("lo"))
      b.groupBy(col("user_id"))
        .agg(
          max(col("n")).as("n"),
          max(col("lo")).as("n_cut"),
          sum(when(col("rn") > col("lo") && col("rn") <= col("hi"),
            col("cents"))).as("sum_keep"),
          max(when(col("rn") === col("lo") + 1, col("cents"))).as("low_cut"),
          max(when(col("rn") === col("hi"), col("cents"))).as("high_cut"),
          sum(col("cents")).as("sum_all"))
        .select(col("user_id"), col("n"), col("n_cut"),
          col("low_cut"), col("high_cut"),
          expr("sum_all * 1024 div n").as("mean_q"),
          expr("sum_keep * 1024 div (n - 2 * n_cut)").as("trim_mean_q"),
          expr("(sum_keep + n_cut * low_cut + n_cut * high_cut) * 1024 div n")
            .as("wins_mean_q"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH b AS (SELECT user_id, event_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                 FROM events),
      r AS (SELECT user_id, cents,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY cents, event_id) AS rn,
              COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM b),
      g AS (SELECT user_id, MAX(n) AS n, MAX(n // 10) AS n_cut,
              SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                       THEN cents END) AS sum_keep,
              MAX(CASE WHEN rn = n // 10 + 1 THEN cents END) AS low_cut,
              MAX(CASE WHEN rn = n - n // 10 THEN cents END) AS high_cut,
              SUM(cents) AS sum_all
            FROM r GROUP BY user_id)
      SELECT user_id, CAST(n AS BIGINT) AS n, CAST(n_cut AS BIGINT) AS n_cut,
             CAST(low_cut AS BIGINT) AS low_cut,
             CAST(high_cut AS BIGINT) AS high_cut,
             CAST(sum_all * 1024 // n AS BIGINT) AS mean_q,
             CAST(sum_keep * 1024 // (n - 2 * n_cut) AS BIGINT)
               AS trim_mean_q,
             CAST((sum_keep + n_cut * low_cut + n_cut * high_cut) * 1024 // n
               AS BIGINT) AS wins_mean_q
      FROM g ORDER BY user_id""")),

    // ---- per-node triangle counts: the local-clustering signal that
    // separates organic link neighborhoods from spam farms. Degree-
    // ORIENTED wedge join (each edge oriented from its (deg, id)-lower
    // endpoint) so a hub's oriented out-degree is O(sqrt(m)) — three
    // node-keyed equi-joins, never an unoriented hub self-join; counts
    // all exact integers --------------------------------------------
    ("g03_triangles", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.triangleCounts(eventEdges(s, d))
    }, Some(s"""
      WITH $eventEdgesCtes,
      und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM ed WHERE src <> dst),
      dg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS deg FROM
               (SELECT a AS k FROM und UNION ALL SELECT b FROM und) u
             GROUP BY k),
      ornt AS (SELECT CASE WHEN da.deg > db.deg THEN und.b ELSE und.a END AS u,
                      CASE WHEN da.deg > db.deg THEN und.a ELSE und.b END AS v,
                      CASE WHEN da.deg > db.deg THEN da.deg ELSE db.deg END AS dv
               FROM und JOIN dg da ON da.k = und.a JOIN dg db ON db.k = und.b),
      tri AS (SELECT o1.u AS x, o1.v AS y, o2.v AS z
              FROM ornt o1 JOIN ornt o2 ON o1.u = o2.u
                AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
              WHERE EXISTS (SELECT 1 FROM ornt o3
                            WHERE o3.u = o1.v AND o3.v = o2.v)),
      tn AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_tri FROM
               (SELECT x AS k FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) t
             GROUP BY k)
      SELECT dg.k, dg.deg, dg.deg * (dg.deg - 1) // 2 AS n_wedges,
             COALESCE(tn.n_tri, 0) AS n_tri
      FROM dg LEFT JOIN tn ON tn.k = dg.k
      ORDER BY dg.k""")),

    // ---- INCREMENTAL triangle deltas: the graph-family batch-vs-
    // corpus twin (c04/s25 contract). Old graph = transitions of users
    // outside the 0-mod-5 cohort; the cohort's transitions arrive as
    // the new batch. Engine counts only union triangles touching a
    // genuinely-new edge, Δ-anchored (never re-pairing the old graph);
    // the oracle is SCHEME-BLIND: per-node T(union) − T(old) via two
    // brute a<b<c closures --------------------------------------------
    ("g25_incremental_triangles", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ev = t(s, d, "events")
      Graphs.incrementalTriangles(
        eventEdgesOf(ev.filter(col("user_id") % 5 =!= 0)),
        eventEdgesOf(ev.filter(col("user_id") % 5 === 0)))
    }, Some(s"""
      WITH ev AS (SELECT user_id, ts, event_id,
                    CAST(json_extract_string(props, '$$.k') AS INT) AS k
             FROM events
             WHERE json_extract_string(props, '$$.k') IS NOT NULL),
      tr AS (SELECT user_id, k, LAG(k) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS src FROM ev),
      edall AS (SELECT user_id, CAST(src AS BIGINT) AS src,
                       CAST(k AS BIGINT) AS dst
                FROM tr WHERE src IS NOT NULL),
      undo AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
               FROM edall WHERE src <> dst AND user_id % 5 <> 0),
      undu AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
               FROM edall WHERE src <> dst),
      trio AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM undo e1 JOIN undo e2 ON e2.a = e1.b
                 JOIN undo e3 ON e3.a = e1.a AND e3.b = e2.b),
      triu AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM undu e1 JOIN undu e2 ON e2.a = e1.b
                 JOIN undu e3 ON e3.a = e1.a AND e3.b = e2.b),
      cno AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM
                (SELECT x AS k FROM trio UNION ALL SELECT y FROM trio
                 UNION ALL SELECT z FROM trio) t GROUP BY k),
      cnu AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM
                (SELECT x AS k FROM triu UNION ALL SELECT y FROM triu
                 UNION ALL SELECT z FROM triu) t GROUP BY k)
      SELECT cnu.k, cnu.n - COALESCE(cno.n, 0) AS d_tri
      FROM cnu LEFT JOIN cno ON cno.k = cnu.k
      WHERE cnu.n - COALESCE(cno.n, 0) > 0
      ORDER BY cnu.k""")),

    // ---- WARM-START PageRank refresh (the graph family's second
    // incremental member): converged old-cohort ranks seed ONE damped
    // update over the union graph — how production rank maintenance
    // absorbs a batch of link changes without a cold fixed-point run.
    // Oracle unrolls both phases in the g01 integer fixed point ------
    ("g26_pagerank_warm", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ev = t(s, d, "events")
      Graphs.pageRankWarmStart(
        eventEdgesOf(ev.filter(col("user_id") % 5 =!= 0)),
        eventEdgesOf(ev.filter(col("user_id") % 5 === 0)),
        baseIters = 3, refreshIters = 1)
    }, Some {
      val scale = 1L << 40
      val oldIters = (1 to 3).map { i =>
        s"""co$i AS (SELECT edo.dst, SUM(ro${i - 1}.r * edo.w // owo.ow) AS s
              FROM edo JOIN owo ON edo.src = owo.src
              JOIN ro${i - 1} ON ro${i - 1}.k = edo.src GROUP BY edo.dst),
        ro$i AS (SELECT nodeso.k,
                  (15 * $scale // 100) // (SELECT n FROM nno)
                    + 85 * COALESCE(co$i.s, 0) // 100 AS r
                FROM nodeso LEFT JOIN co$i ON co$i.dst = nodeso.k)"""
      }.mkString(",\n        ")
      s"""
      WITH ev AS (SELECT user_id, ts, event_id,
                    CAST(json_extract_string(props, '$$.k') AS INT) AS k
             FROM events
             WHERE json_extract_string(props, '$$.k') IS NOT NULL),
      tr AS (SELECT user_id, k, LAG(k) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS src FROM ev),
      edall AS (SELECT user_id, CAST(src AS BIGINT) AS src,
                       CAST(k AS BIGINT) AS dst
                FROM tr WHERE src IS NOT NULL),
      edo AS (SELECT src, dst, COUNT(*) AS w FROM edall
              WHERE user_id % 5 <> 0 GROUP BY 1, 2),
      ed AS (SELECT src, dst, COUNT(*) AS w FROM edall GROUP BY 1, 2),
      owo AS (SELECT src, SUM(w) AS ow FROM edo GROUP BY src),
      nodeso AS (SELECT DISTINCT k FROM
                   (SELECT src AS k FROM edo UNION SELECT dst FROM edo) u),
      nno AS (SELECT COUNT(*) AS n FROM nodeso),
      ro0 AS (SELECT k, $scale // (SELECT n FROM nno) AS r FROM nodeso),
      $oldIters,
      ow AS (SELECT src, SUM(w) AS ow FROM ed GROUP BY src),
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      rw0 AS (SELECT nodes.k,
                COALESCE(ro3.r, $scale // (SELECT n FROM nn)) AS r
              FROM nodes LEFT JOIN ro3 ON ro3.k = nodes.k),
      cw AS (SELECT ed.dst, SUM(rw0.r * ed.w // ow.ow) AS s
             FROM ed JOIN ow ON ed.src = ow.src
             JOIN rw0 ON rw0.k = ed.src GROUP BY ed.dst),
      rw1 AS (SELECT nodes.k,
                (15 * $scale // 100) // (SELECT n FROM nn)
                  + 85 * COALESCE(cw.s, 0) // 100 AS r
              FROM nodes LEFT JOIN cw ON cw.dst = nodes.k)
      SELECT rw0.k, CAST(rw0.r AS BIGINT) AS r_start,
             CAST(rw1.r AS BIGINT) AS r_warm,
             CAST(rw1.r - rw0.r AS BIGINT) AS d_fp
      FROM rw0 JOIN rw1 ON rw1.k = rw0.k
      ORDER BY rw0.k"""
    }),

    // ---- community detection: synchronous label propagation, 2 exact
    // deterministic iterations (argmax neighbor-label weight, ties to
    // the smallest label) — the site/community grouping pass before
    // per-community curation quotas. Oracle = both iterations unrolled
    // as CTEs over the symmetrized edge list --------------------------
    ("g04_label_propagation", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.labelPropagation(eventEdges(s, d), iters = 2)
    }, Some {
      s"""
      WITH $eventEdgesCtes,
      ${lpaCtes(2)}
      SELECT k, CAST(label AS BIGINT) AS label FROM l2 ORDER BY k"""
    }),

    // ---- partition-quality audit: Newman-Girvan modularity of the
    // g04 LPA communities over the same symmetrized transition graph.
    // Q = (intra2*M2 - sum_c Dc^2) / M2^2 with every term an exact
    // BIGINT and ONE final double division (aggregation-order-free);
    // the Observation-enforced M2 < 2^31 envelope is the same
    // discipline as PageRank's weight check. The oracle re-derives the
    // labels (the shared LPA CTEs) and every modularity term ---------
    ("g12_modularity", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ed = eventEdges(s, d).cpGuard()
      Graphs.modularity(ed, Graphs.labelPropagation(ed, iters = 2))
    }, Some {
      s"""
      WITH $eventEdgesCtes,
      ${lpaCtes(2)},
      syml AS (SELECT sym.src, sym.dst, sym.w, la.label AS la, lb.label AS lb
               FROM sym JOIN l2 la ON la.k = sym.src
                        JOIN l2 lb ON lb.k = sym.dst),
      tot AS (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) AS m2,
                     CAST(COALESCE(SUM(CASE WHEN la = lb THEN w ELSE 0 END), 0)
                       AS BIGINT) AS intra2
              FROM syml),
      dg AS (SELECT src, la, SUM(w) AS d FROM syml GROUP BY 1, 2),
      dc AS (SELECT la, SUM(d) AS dcw FROM dg GROUP BY 1),
      ds AS (SELECT CAST(COALESCE(SUM(dcw * dcw), 0) AS BIGINT) AS dsq FROM dc)
      SELECT m2, intra2, dsq,
             CASE WHEN m2 > 0
                  THEN CAST(intra2 * m2 - dsq AS DOUBLE) / (m2 * m2)
             END AS modularity
      FROM tot CROSS JOIN ds"""
    }),

    // ---- per-community structure profile: size, intra-edge weight,
    // degree mass, internal ratio (cohesion) for each g04 community —
    // g12's global Q says the partition is real, this says WHICH
    // communities are cohesive curation units. Exact BIGINT terms,
    // one double division per row -------------------------------------
    ("g13_community_profile", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ed = eventEdges(s, d).cpGuard()
      Graphs.communityProfile(ed, Graphs.labelPropagation(ed, iters = 2))
    }, Some {
      s"""
      WITH $eventEdgesCtes,
      ${lpaCtes(2)},
      syml AS (SELECT sym.src, sym.w, la.label AS la, lb.label AS lb
               FROM sym JOIN l2 la ON la.k = sym.src
                        JOIN l2 lb ON lb.k = sym.dst),
      nn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
             FROM l2 GROUP BY 1),
      pr AS (SELECT la,
                    CAST(COALESCE(SUM(CASE WHEN la = lb THEN w ELSE 0 END), 0)
                      AS BIGINT) AS intra2,
                    CAST(COALESCE(SUM(w), 0) AS BIGINT) AS deg_sum
             FROM syml GROUP BY 1)
      SELECT nn.label, nn.n_nodes,
             CAST(COALESCE(pr.intra2, 0) AS BIGINT) AS intra2,
             CAST(COALESCE(pr.deg_sum, 0) AS BIGINT) AS deg_sum,
             CASE WHEN COALESCE(pr.deg_sum, 0) > 0
                  THEN CAST(pr.intra2 AS DOUBLE) / pr.deg_sum
             END AS internal_ratio
      FROM nn LEFT JOIN pr ON pr.la = nn.label
      ORDER BY nn.label"""
    }),

    // ---- degree assortativity (Newman 2002): over the symmetrized
    // list endpoint degrees are identically distributed, so Pearson's
    // r collapses to the FULLY RATIONAL (M*Sxy - Sx^2)/(M*Sxx - Sx^2)
    // — exact BIGINT sums, no sqrt, one double division; degenerate
    // (regular) graphs yield null, never NaN ------------------------
    ("g14_assortativity", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.assortativity(eventEdges(s, d))
    }, Some {
      s"""
      WITH $eventEdgesCtes,
      und AS (SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM ed WHERE src <> dst
                UNION ALL
                SELECT dst, src FROM ed WHERE src <> dst) u),
      dg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS dx FROM und GROUP BY 1),
      e AS (SELECT a.dx AS x, b.dx AS y
            FROM und JOIN dg a ON a.src = und.src
                     JOIN dg b ON b.src = und.dst),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                    CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx,
                    CAST(COALESCE(SUM(x*x), 0) AS BIGINT) AS sxx,
                    CAST(COALESCE(SUM(x*y), 0) AS BIGINT) AS sxy FROM e)
      SELECT m, sx, sxx, sxy,
             CASE WHEN m*sxx - sx*sx > 0
                  THEN CAST(m*sxy - sx*sx AS DOUBLE) / (m*sxx - sx*sx)
             END AS assortativity
      FROM st"""
    }),

    // ---- trust-radius BFS: minimum-hop distance from a seed set over
    // the item-transition graph (TrustRank's propagation step — nodes
    // near a curated seed set inherit trust, spam sits far away or
    // unreachable). The engine runs the frontier/delta iteration; the
    // oracle unrolls the equivalent min-expansion recurrence
    // d_i = min(d_{i-1}, 1 + d_{i-1}∘edges) — identical min-hop
    // distances, provable by induction on i --------------------------
    ("g05_bfs_hops", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      // checkpoint once: both the seed derivation and the BFS read the
      // edge list, and the per-user window behind eventEdges is the
      // expensive part — never re-derive it per consumer
      val ed = eventEdges(s, d).cpGuard()
      val nodes = ed.select(col("src").as("k"))
        .union(ed.select(col("dst").as("k"))).distinct()
      Graphs.bfsHops(ed, nodes.filter(col("k") % 13 === 0), maxHops = 3)
    }, Some {
      val iterCtes = (1 to 3).map { i =>
        s"""d$i AS (SELECT k, MIN(hop) AS hop FROM (
                SELECT k, hop FROM d${i - 1}
                UNION ALL
                SELECT ed.dst AS k, d${i - 1}.hop + 1 AS hop
                FROM ed JOIN d${i - 1} ON ed.src = d${i - 1}.k) u
              GROUP BY k)"""
      }.mkString(",\n        ")
      s"""
      WITH $eventEdgesCtes,
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      d0 AS (SELECT k, 0 AS hop FROM nodes WHERE k % 13 = 0),
      $iterCtes
      SELECT k, CAST(hop AS INT) AS hop FROM d3 ORDER BY k"""
    }),

    // ---- weighted SSSP (Bellman-Ford, 3 relaxation rounds): g05's
    // bounded-radius contract lifted to weighted cost — dist = min
    // total edge weight over paths of <= 3 edges from the seed set,
    // exact BIGINT sums; Spark side relaxes only the improved delta
    // per round, the oracle's full relax provably agrees round-for-
    // round (unimproved nodes contribute only dominated candidates) --
    ("g18_sssp", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ed = eventEdges(s, d).cpGuard()
      val nodes = ed.select(col("src").as("k"))
        .union(ed.select(col("dst").as("k"))).distinct()
      Graphs.sssp(ed, nodes.filter(col("k") % 13 === 0), rounds = 3)
    }, Some {
      val iterCtes = (1 to 3).map { i =>
        s"""d$i AS (SELECT k, CAST(MIN(dist) AS BIGINT) AS dist FROM (
                SELECT k, dist FROM d${i - 1}
                UNION ALL
                SELECT ed.dst AS k, d${i - 1}.dist + ed.w AS dist
                FROM ed JOIN d${i - 1} ON ed.src = d${i - 1}.k) u
              GROUP BY k)"""
      }.mkString(",\n        ")
      s"""
      WITH $eventEdgesCtes,
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      d0 AS (SELECT k, CAST(0 AS BIGINT) AS dist FROM nodes
             WHERE k % 13 = 0),
      $iterCtes
      SELECT k, dist FROM d3 ORDER BY k"""
    }),

    // ---- HyperBall neighborhood function (Boldi & Vigna 2013): the
    // t-hop reachable-pair curve N(t) = sum of per-node HLL ball
    // estimates — linear register state where the exact version needs
    // quadratic reachable SETS; the per-node estimates are floored to
    // BIGINT after one IEEE division (d16 discipline) so N(t) is an
    // exact integer sum both engines agree on digit-for-digit.
    // Backbone: top-300 transition edges (the g17 convention) --------
    ("g19_hyperball_nf", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.hyperBall(hbBackbone(s, d), maxT = 3)
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("ball")).as("nf"))
        .orderBy(col("t"))
    }, Some(s"""
      WITH $eventEdgesCtes,
      ${hyperBallCtes(maxT = 3, topE = 300)}
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(ball) AS BIGINT) AS nf
      FROM ball GROUP BY t ORDER BY t""")),

    // ---- harmonic centrality from the SAME HyperBall registers: c(v)
    // = sum_t (ball_t - ball_{t-1})/t, scaled by 12 = lcm(1,2,3) so it
    // stays exact BIGINT; linearized over the monotone ball curve to
    // -12*b0 + 6*b1 + 2*b2 + 4*b3. The "which nodes see the most of
    // the graph soonest" ranking at sketch cost (Boldi & Vigna's
    // motivating application) ----------------------------------------
    ("g20_hyperball_centrality", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.hyperBall(hbBackbone(s, d), maxT = 3)
        .groupBy(col("k"))
        .agg(sum(when(col("t") === 0, lit(-12L) * col("ball"))
            .when(col("t") === 1, lit(6L) * col("ball"))
            .when(col("t") === 2, lit(2L) * col("ball"))
            .otherwise(lit(4L) * col("ball"))).as("harmonic12"),
          max(when(col("t") === 3, col("ball"))).as("ball3"))
        .orderBy(col("harmonic12").desc, col("k")).limit(20)
    }, Some(s"""
      WITH $eventEdgesCtes,
      ${hyperBallCtes(maxT = 3, topE = 300)}
      SELECT k,
             CAST(SUM(CASE WHEN t = 0 THEN -12 * ball
                           WHEN t = 1 THEN 6 * ball
                           WHEN t = 2 THEN 2 * ball
                           ELSE 4 * ball END) AS BIGINT) AS harmonic12,
             CAST(MAX(CASE WHEN t = 3 THEN ball END) AS BIGINT) AS ball3
      FROM ball GROUP BY k
      ORDER BY harmonic12 DESC, k LIMIT 20""")),

    // ---- effective diameter from the SAME HyperBall curve (Palmer /
    // ANF; Boldi & Vigna's headline statistic): the smallest t whose
    // reachable-pair count N(t) reaches pct% of the final N(maxT),
    // for pct in {50, 75, 90} — integer cross-multiplied (100*nf >=
    // pct*nf_max), never a float ratio. Everything after the hyperBall
    // sketch is constant-size (maxT+1 rows x 3 thresholds): the
    // bounded-broadcast joins here are by construction, not by data --
    ("g21_effective_diameter", (s: SparkSession, d: String) => {
      import s.implicits._
      import graft.ext.Graphs
      val nf = Graphs.hyperBall(hbBackbone(s, d), maxT = 3)
        .groupBy(col("t"))
        .agg(sum(col("ball")).as("nf"))
      val mx = nf.agg(max(col("nf")).as("nf_max"))
      Seq(50, 75, 90).toDF("pct")
        .crossJoin(broadcast(mx))
        .join(broadcast(nf), lit(100) * col("nf") >= col("pct") * col("nf_max"))
        .groupBy(col("pct"), col("nf_max"))
        .agg(min(col("t")).as("t_eff"))
        .join(broadcast(nf.toDF("t", "nf_t")), col("t_eff") === col("t"))
        .select(col("pct"), col("t_eff"), col("nf_t"), col("nf_max"))
        .orderBy(col("pct"))
    }, Some(s"""
      WITH $eventEdgesCtes,
      ${hyperBallCtes(maxT = 3, topE = 300)},
      nf AS (SELECT t, CAST(SUM(ball) AS BIGINT) AS nf
             FROM ball GROUP BY t),
      mx AS (SELECT MAX(nf) AS nf_max FROM nf),
      q AS (SELECT th.pct, mx.nf_max, MIN(nf.t) AS t_eff
            FROM (VALUES (50), (75), (90)) th(pct), mx, nf
            WHERE 100 * nf.nf >= th.pct * mx.nf_max
            GROUP BY th.pct, mx.nf_max)
      SELECT q.pct, q.t_eff, nf.nf AS nf_t, q.nf_max
      FROM q JOIN nf ON nf.t = q.t_eff
      ORDER BY q.pct""")),

    // ---- bow-tie decomposition (Broder 2000) by the pivot method:
    // core = the highest-degree node's SCC (forward ∩ backward reach),
    // in/out/other around it — two frontier fixpoints, never a full
    // SCC or closure; oracle classifies off the recursive closure,
    // blind to the scheme ---------------------------------------------
    ("g24_bowtie", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val backbone = eventEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .orderBy(col("w").desc, col("src"), col("dst")).limit(150)
        .select(col("src"), col("dst"))
      Graphs.bowTie(backbone)
    }, Some(s"""
      WITH $eventEdgesCtes,
      ed2 AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 150)),
      an AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM ed2 UNION ALL SELECT dst FROM ed2)),
      dg AS (SELECT k, COUNT(*) AS deg FROM
             (SELECT src AS k FROM ed2 UNION ALL SELECT dst FROM ed2) u
             GROUP BY k),
      pv AS (SELECT k FROM dg ORDER BY deg DESC, k LIMIT 1),
      rk AS (WITH RECURSIVE reach AS (
          SELECT src AS a, dst AS b FROM ed2
          UNION
          SELECT r.a, e.dst FROM reach r JOIN ed2 e ON r.b = e.src
        ) SELECT * FROM reach),
      fwd AS (SELECT b AS k FROM rk JOIN pv ON rk.a = pv.k
              UNION SELECT k FROM pv),
      bwd AS (SELECT a AS k FROM rk JOIN pv ON rk.b = pv.k
              UNION SELECT k FROM pv)
      SELECT an.k,
             CASE WHEN an.k IN (SELECT k FROM fwd)
                   AND an.k IN (SELECT k FROM bwd) THEN 'core'
                  WHEN an.k IN (SELECT k FROM bwd) THEN 'in'
                  WHEN an.k IN (SELECT k FROM fwd) THEN 'out'
                  ELSE 'other' END AS bowtie
      FROM an ORDER BY k""")),

    // ---- directed 3-node motif census (Milo 2002): feed-forward
    // loops vs 3-cycles on the top-300 backbone — two equi-join
    // chains, node distinctness automatic (a coincidence would need a
    // self-loop), cycles anchored at their minimum node ---------------
    ("g23_motif_census", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.motifCensus(hbBackbone(s, d))
    }, Some(s"""
      WITH $eventEdgesCtes,
      edb AS (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 300)),
      ffl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM edb ab JOIN edb bc ON bc.src = ab.dst
              JOIN edb ac ON ac.src = ab.src AND ac.dst = bc.dst),
      cyc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM edb ab JOIN edb bc ON bc.src = ab.dst
              JOIN edb ca ON ca.src = bc.dst AND ca.dst = ab.src
              WHERE ab.src < bc.src AND ab.src < bc.dst)
      SELECT 'cycle' AS motif, n FROM cyc
      UNION ALL SELECT 'ffl' AS motif, n FROM ffl
      ORDER BY motif""")),

    // ---- directed-edge reciprocity (Newman 2002): is attention
    // mutual — one swapped-key self semi-join over the simple
    // transition graph, exact ppm ------------------------------------
    ("g22_reciprocity", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.reciprocity(eventEdges(s, d))
    }, Some(s"""
      WITH $eventEdgesCtes,
      sed AS (SELECT DISTINCT src, dst FROM ed WHERE src <> dst),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM sed),
      r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocal
            FROM sed a WHERE EXISTS (SELECT 1 FROM sed b
              WHERE b.src = a.dst AND b.dst = a.src))
      SELECT n.n_edges, r.n_reciprocal,
             CAST((CAST(r.n_reciprocal AS HUGEINT) * 1000000)
               // n.n_edges AS BIGINT) AS reciprocity_ppm
      FROM n, r""")),

    // ---- k-core peel: the embeddedness companion to g03's closure —
    // three peel rounds dropping nodes whose surviving degree < 3 over
    // the undirected simple transition graph; link farms and scrape
    // chains (star/chain shells) collapse in the first rounds. Oracle
    // unrolls the identical peel: degree groupBy + two IN-survivor
    // restrictions per round ------------------------------------------
    ("g06_kcore", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.kCore(eventEdges(s, d), minDeg = 3, iters = 3)
    }, Some(s"""
      WITH $eventEdgesCtes,
      ${kcorePeelCtes(minDeg = 3, rounds = 3, pfx = "")}
      SELECT k, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS k FROM e3 UNION ALL SELECT b FROM e3) u
      GROUP BY k ORDER BY k""")),

    // ---- coreness decay curve: the g06 sweep (the s23 discipline
    // applied to graphs) — surviving-core size and degree mass at
    // minDeg 2/3/4, each sweep point nesting the full peel verbatim.
    // The corpus-graph embeddedness profile: how fast the graph
    // evaporates as the core requirement tightens ---------------------
    ("g07_coreness_sweep", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val ed = eventEdges(s, d).cpGuard()
      // the three sweep points are independent peel loops over the
      // checkpointed edges — overlap their per-iteration jobs (guide
      // §2.6); values are unchanged, only scheduling overlaps
      val mds = Seq(2, 3, 4)
      val cores = graft.core.Par.evalAll(mds.map { md => () =>
        Graphs.kCore(ed, minDeg = md, iters = 3)
      })
      mds.zip(cores).map { case (md, core) =>
        core.asInstanceOf[DataFrame]
          .agg(count(lit(1)).as("n_core_nodes"),
            coalesce(sum(col("deg")), lit(0L)).as("sum_deg"))
          .select(lit(md).cast("int").as("min_deg"),
            col("n_core_nodes"), col("sum_deg"))
      }.reduce(_ unionAll _).orderBy(col("min_deg"))
    }, Some {
      def sweepPoint(md: Int): String = s"""
        SELECT CAST($md AS INT) AS min_deg,
               CAST(COUNT(*) AS BIGINT) AS n_core_nodes,
               COALESCE(CAST(SUM(deg) AS BIGINT), 0) AS sum_deg
        FROM (SELECT k, COUNT(*) AS deg FROM (
                SELECT a AS k FROM m${md}_e3 UNION ALL SELECT b FROM m${md}_e3) u
              GROUP BY k) z"""
      s"""
      WITH $eventEdgesCtes,
      ${Seq(2, 3, 4).map(md =>
        kcorePeelCtes(minDeg = md, rounds = 3, pfx = s"m${md}_")).mkString(",\n      ")}
      SELECT * FROM (${Seq(2, 3, 4).map(sweepPoint).mkString(" UNION ALL ")}) s
      ORDER BY min_deg"""
    }),

    // ---- ordered funnel analysis: view -> click -> purchase, each
    // step's timestamp strictly after the previous step's. Three
    // per-user MIN aggregations chained by user_id equi-joins (all
    // co-partitioned after the first shuffle) — never a per-user
    // event-array materialization; conversion lag sums exact micros ----
    ("w10_funnel_steps", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      def step(typ: String) = ev.filter(col("event_type") === typ)
        .select(col("user_id"), col("ts"))
      val s1 = step("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = step("click").join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = step("purchase").join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .agg(count(col("t1")).as("n_view"), count(col("t2")).as("n_view_click"),
          count(col("t3")).as("n_full"),
          coalesce(sum(when(col("t3").isNotNull,
            unix_micros(col("t3")) - unix_micros(col("t1")))), lit(0L))
            .as("sum_lag_us"))
    }, Some("""
      WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      SELECT CAST(COUNT(s1.t1) AS BIGINT) AS n_view,
             CAST(COUNT(s2.t2) AS BIGINT) AS n_view_click,
             CAST(COUNT(s3.t3) AS BIGINT) AS n_full,
             CAST(COALESCE(SUM(CASE WHEN s3.t3 IS NOT NULL
               THEN epoch_us(s3.t3) - epoch_us(s1.t1) END), 0) AS BIGINT) AS sum_lag_us
      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // ---- embedding stats per label (exact: min/max of exact norms) ---
    ("s04_embedding_stats", (s: SparkSession, d: String) => {
      import graft.functions.VectorExpressions
      Tables.spread(t(s, d, "embeddings"))
        .select(col("label"),
          VectorExpressions.normD(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
        .orderBy(col("label"))
    }, Some(s"""
      SELECT label, COUNT(*) AS n,
             MIN(${graft.ext.Similarity.normSql("embedding")}) AS min_norm,
             MAX(${graft.ext.Similarity.normSql("embedding")}) AS max_norm
      FROM embeddings GROUP BY label ORDER BY label""")),

    // ---- int8 embedding quantization: the 4x storage shrink before any
    // ANN index build; codes and exact reconstruction error verify
    // bit-for-bit (floor(+0.5) rounding + left-fold double error sum) --
    ("s08_embedding_quantize", (s: SparkSession, d: String) =>
      graft.ext.Similarity.quantizeInt8(t(s, d, "embeddings")),
      Some("""
      WITH v AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
            / CAST(127 AS DOUBLE) AS scale
        FROM embeddings),
      q AS (SELECT vec_id, scale, v,
          CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
               ELSE list_transform(v, x -> GREATEST(CAST(-127 AS BIGINT),
                  LEAST(CAST(127 AS BIGINT),
                    CAST(floor(x / scale + CAST(0.5 AS DOUBLE)) AS BIGINT))))
          END AS q FROM v)
      SELECT vec_id, scale,
        md5(array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',')) AS q_md5,
        CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
             ELSE list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(len(v)), i ->
                 (v[i+1] - q[i+1]*scale) * (v[i+1] - q[i+1]*scale))),
               (acc, e) -> acc + e)
        END AS sq_err
      FROM q ORDER BY vec_id""")),

    // ---- distributed k-means (Lloyd, 2 unrolled iterations): init =
    // k lowest vec_ids; fixed-point 2^-40 centroid means make the
    // floating sums order-independent, so assignments AND distances
    // verify bit-for-bit (see Similarity.kmeansFit) --------------------
    ("s09_kmeans", (s: SparkSession, d: String) =>
      graft.ext.Similarity.kmeansFit(t(s, d, "embeddings"), k = 8, iters = 2),
      Some(kmeansOracle(k = 8, iters = 2))),

    // ---- SemDeDup: k-means clusters as the near-dup blocking key,
    // cosine verify + drop-the-centroid-nearest only within a cluster.
    // maxCluster = MaxValue on the verified twin: the oracle computes
    // the cap-free candidate set by construction (the cap itself is
    // spec-tested in SketchOpsSpec) --------------------------------------
    ("s13_semdedup", (s: SparkSession, d: String) =>
      graft.ext.Similarity.semDedup(t(s, d, "embeddings"),
        k = 8, iters = 2, threshold = 0.4, maxCluster = Int.MaxValue),
      Some(semDedupOracle(k = 8, iters = 2, threshold = 0.4))),

    // ---- IVF index quality audit: per-cell population and residual
    // spread plus the global imbalance factor (k * sum n_c^2 / n^2, the
    // Faiss nlist-health metric — 1.0 = perfectly balanced cells, big =
    // hot cells that break the nProbe cost model). Sums are fixed-point
    // (exact), the imbalance is integer products + ONE division --------
    ("s15_ivf_cell_stats", (s: SparkSession, d: String) => {
      val Q = 1099511627776.0 // 2^40
      val cells = graft.ext.Similarity
        .kmeansFit(t(s, d, "embeddings"), k = 8, iters = 2)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"), max(col("dist2")).as("max_dist2"),
          sum(floor(col("dist2") * lit(Q)).cast("long")).as("__sq"))
        .withColumn("sum_dist2", col("__sq").cast("double") / lit(Q))
        .drop("__sq")
      val tot = cells.agg(sum(col("n_vecs")).as("n_total"),
        sum(col("n_vecs") * col("n_vecs")).as("n_sq"))
      cells.crossJoin(broadcast(tot))
        .withColumn("imbalance",
          (lit(8L) * col("n_sq")).cast("double")
            / (col("n_total") * col("n_total")).cast("double"))
        .select(col("cluster"), col("n_vecs"), col("max_dist2"),
          col("sum_dist2"), col("imbalance"))
        .orderBy(col("cluster"))
    }, Some(s"""
      WITH ${kmeansCtes("", "embedding", 8, 2)},
      cells AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                       MAX(dist2) AS max_dist2,
                       CAST(SUM(CAST(floor(dist2 * 1099511627776.0) AS BIGINT)) AS DOUBLE)
                         / 1099511627776.0 AS sum_dist2
                FROM a3 GROUP BY cluster),
      tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
                     CAST(SUM(n_vecs * n_vecs) AS BIGINT) AS n_sq FROM cells)
      SELECT cluster, n_vecs, max_dist2, sum_dist2,
             CAST(8 * n_sq AS DOUBLE) / CAST(n_total * n_total AS DOUBLE) AS imbalance
      FROM cells, tot ORDER BY cluster""")),

    // ---- cluster-balanced (diversity) sampling: per-cluster nearest
    // perCluster members via the map-side TopKAggregator ----------------
    ("s14_cluster_sample", (s: SparkSession, d: String) =>
      graft.ext.Similarity.clusterSample(t(s, d, "embeddings"),
        k = 8, iters = 2, perCluster = 10),
      Some(s"""
      WITH ${kmeansCtes("", "embedding", 8, 2)}
      SELECT vec_id, cluster, dist2, CAST(rn AS INT) AS rk FROM (
        SELECT vec_id, cluster, dist2,
               ROW_NUMBER() OVER (PARTITION BY cluster
                 ORDER BY dist2, vec_id) AS rn
        FROM a3) z
      WHERE rn <= 10 ORDER BY cluster, rk""")),

    // ---- product quantization: 4 subspace codebooks (k=16, 1 Lloyd
    // round each) -> 4 nibble codes per 64-dim vector; codes and
    // residual sums bit-exact ------------------------------------------
    ("s10_pq_encode", (s: SparkSession, d: String) =>
      graft.ext.Similarity.pqEncode(t(s, d, "embeddings"),
        nSub = 4, k = 16, iters = 1),
      Some(pqOracle(nSub = 4, dims = 64, k = 16, iters = 1))),

    // ---- PQ ADC search: per-query distance tables over the codebooks,
    // targets scanned as codes; approximate top-k bit-exact ------------
    ("s11_pq_adc_topk", (s: SparkSession, d: String) =>
      graft.ext.Similarity.pqAdcTopK(t(s, d, "embeddings"),
        nSub = 4, k = 16, iters = 1, nQueries = 10, topK = 5),
      Some(pqAdcOracle(nSub = 4, dims = 64, k = 16, iters = 1,
        nQ = 10, topK = 5))),

    // ---- IVF-PQ: coarse cells bound the ADC scan to nProbe cells per
    // query — the production ANN shape, bit-exact end to end ----------
    ("s12_ivf_pq_topk", (s: SparkSession, d: String) =>
      graft.ext.Similarity.ivfPqTopK(t(s, d, "embeddings"),
        nCells = 8, nProbe = 2, nSub = 4, k = 16, iters = 1,
        nQueries = 10, topK = 5),
      Some(ivfPqOracle(nCells = 8, nProbe = 2, nSub = 4, dims = 64,
        k = 16, iters = 1, nQ = 10, topK = 5))),

    // s12 served from a PERSISTED residual IVF-PQ index (cell-bucketed
    // code rows + codebook parquet): the build-once/query-many shape,
    // gated by the SAME oracle as the live query — byte-identical
    // results through persistence, zero-Exchange corpus probe
    // (SelectionOpsSpec asserts the plan)
    ("s22_ivf_pq_persisted", (s: SparkSession, d: String) => {
      val table = "graft_ivf_pq_idx_q"
      val cbPath = s.conf.get("spark.sql.warehouse.dir") +
        "/graft_ivf_pq_codebooks_q"
      s.sql(s"DROP TABLE IF EXISTS $table")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + s"/$table")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      graft.ext.Similarity.persistIvfPqIndex(t(s, d, "embeddings"),
        nCells = 8, nSub = 4, k = 16, iters = 1, nQueries = 10,
        table = table, buckets = 8, codebookPath = cbPath)
      graft.ext.Similarity.ivfPqTopKFromIndex(s, table, cbPath,
        t(s, d, "embeddings"), nProbe = 2, nQueries = 10, topK = 5)
    }, Some(ivfPqOracle(nCells = 8, nProbe = 2, nSub = 4, dims = 64,
      k = 16, iters = 1, nQ = 10, topK = 5))),

    // ---- IVF-PQ recall audit: recall@5 of the production ANN shape
    // (s12's coarse-probe + residual-ADC scan) against the EXACT
    // squared-L2 top-5 — the end-to-end quality number an IVF-PQ
    // deployment reports, folding in BOTH loss sources (cells not
    // probed + quantization error), unlike s23 which isolates the
    // probe loss. Exact baseline sits behind a localCheckpoint (the
    // s20 convention) so the registered plan carries no BNLJ ----------
    ("s24_ivf_pq_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      // the exact-L2 baseline and the IVF-PQ pipeline (k-means builds,
      // code/codebook checkpoints) are independent eager chains —
      // overlap their jobs (guide §2.6); values are unchanged
      val (exact, approx) = graft.core.Par.eval2(
        graft.ext.Similarity
          .bruteForceL2TopK(embs, nQueries = 10, k = 5)
          .select(col("query_id"), col("neighbor_id")).cpGuard(),
        graft.ext.Similarity.ivfPqTopK(embs, nCells = 8,
            nProbe = 2, nSub = 4, k = 16, iters = 1, nQueries = 10, topK = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit")))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_exact").cast("double"))
        .orderBy(col("query_id"))
    }, Some {
      val d2 = "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(range(len(q.v)), i -> " +
        "(q.v[i+1] - t.v[i+1]) * (q.v[i+1] - t.v[i+1]))), " +
        "(acc, e) -> acc + e)"
      s"""
      WITH ev24 AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
      sc24 AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                      $d2 AS d2
               FROM ev24 q JOIN ev24 t ON q.vec_id < 10 AND t.vec_id >= 10),
      b24 AS (SELECT query_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY d2, neighbor_id) AS rn FROM sc24) z
              WHERE rn <= 5),
      l24 AS (SELECT query_id, neighbor_id FROM (${ivfPqOracle(nCells = 8,
        nProbe = 2, nSub = 4, dims = 64, k = 16, iters = 1, nQ = 10,
        topK = 5)}) z)
      SELECT b24.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COUNT(l24.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(l24.neighbor_id) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM b24 LEFT JOIN l24
        ON b24.query_id = l24.query_id AND b24.neighbor_id = l24.neighbor_id
      GROUP BY b24.query_id ORDER BY b24.query_id"""
    }),

    // ---- dedup resolution: canonical keep + drop list ----------------
    ("d08_dedup_resolution", (s: SparkSession, d: String) => {
      t(s, d, "documents")
        .groupBy(col("lang"), col("n_chars"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("group_size"),
          (count(lit(1)) - 1).as("n_dropped"))
        .filter(col("group_size") > 1)
        .orderBy(col("lang"), col("n_chars"))
    }, Some("""
      SELECT lang, n_chars, MIN(doc_id) AS keep_id, COUNT(*) AS group_size,
             COUNT(*) - 1 AS n_dropped
      FROM documents GROUP BY lang, n_chars HAVING COUNT(*) > 1
      ORDER BY lang, n_chars""")),

    // ---- array set operations (scalar outputs: sizes/membership) -----
    ("q43_array_ops", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 50)
      val ws = split(col("text"), " ")
      val first5 = slice(ws, 1, 5)
      val last5 = slice(ws, -5, 5)
      docs.select(col("doc_id"),
        size(array_union(first5, last5)).as("n_union"),
        size(array_except(first5, last5)).as("n_except"),
        size(array_intersect(array_distinct(first5), array_distinct(last5))).as("n_intersect"),
        array_contains(ws, "spark").as("has_spark"),
        array_join(array_sort(array_distinct(first5)), ",").as("first5_sorted"))
        .orderBy(col("doc_id"))
    }, Some("""
      WITH x AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 50),
      y AS (SELECT doc_id, ws[1:5] AS f5, ws[-5:] AS l5 FROM x)
      SELECT y.doc_id,
        CAST(len(list_distinct(list_cat(f5, l5))) AS INT) AS n_union,
        CAST(len(list_filter(list_distinct(f5), w -> NOT list_contains(l5, w))) AS INT) AS n_except,
        CAST(len(list_intersect(list_distinct(f5), list_distinct(l5))) AS INT) AS n_intersect,
        list_contains(x.ws, 'spark') AS has_spark,
        array_to_string(list_sort(list_distinct(f5)), ',') AS first5_sorted
      FROM y JOIN x ON x.doc_id = y.doc_id ORDER BY y.doc_id""")),

    // ---- date arithmetic ---------------------------------------------
    ("q47_date_arith", (s: SparkSession, d: String) => {
      t(s, d, "orders").select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
        .select(col("o_orderkey"), col("od"),
          date_add(col("od"), 30).as("plus_30d"),
          date_sub(col("od"), 7).as("minus_7d"),
          add_months(col("od"), 2).as("plus_2m"),
          last_day(col("od")).as("month_end"),
          date_trunc("quarter", col("od")).cast("date").as("quarter_start"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
        CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus_7d,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start
      FROM orders ORDER BY o_orderkey""")),

    // ---- relational division: customers active in EVERY order year ---
    ("q55_relational_division", (s: SparkSession, d: String) => {
      val o = t(s, d, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      val nYears = o.select(col("yr")).distinct()
        .agg(count(lit(1)).as("n_years"))
      o.groupBy(col("o_custkey"))
        .agg(countDistinct(col("yr")).as("n_active_years"))
        .crossJoin(broadcast(nYears))
        .filter(col("n_active_years") === col("n_years"))
        .select(col("o_custkey"), col("n_active_years"))
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT o_custkey, COUNT(DISTINCT year(o_orderdate)) AS n_active_years
      FROM orders GROUP BY o_custkey
      HAVING COUNT(DISTINCT year(o_orderdate)) =
             (SELECT COUNT(DISTINCT year(o_orderdate)) FROM orders)
      ORDER BY o_custkey""")),

    // ---- manual histogram bucketing (no width_bucket in the oracle) --
    ("q48_histogram", (s: SparkSession, d: String) => {
      t(s, d, "orders")
        .select(least(floor(col("o_totalprice") / 50000).cast("int"), lit(9)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }, Some("""
      SELECT LEAST(CAST(floor(o_totalprice / 50000) AS INT), 9) AS bucket, COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY bucket""")),

    // ---- as-of join: purchases pick up their latest prior click ------
    ("a01_asof_join", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.lastBefore(purchases, clicks, "user_id", "ts", Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("clicked_at"), col("asof_click_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      m AS (SELECT p.event_id, p.user_id, p.ts,
              (SELECT max(c.ts) FROM c
               WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS clicked_at
            FROM p)
      SELECT m.event_id, m.user_id, m.ts, m.clicked_at, c.click_id,
             epoch_us(m.ts) - epoch_us(m.clicked_at) AS gap_us
      FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.clicked_at
      ORDER BY m.event_id""")),

    // ---- the same as-of join through the custom physical operator ----
    // (AsOfJoinPlan/AsOfJoinExec via an injected SparkStrategy: one
    // co-partitioned merge, no union/window) — same oracle as a01
    ("a02_asof_native", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.plans.AsOfJoinNative
        .lastBefore(purchases, clicks, "user_id", "ts", Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("clicked_at"), col("asof_click_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      m AS (SELECT p.event_id, p.user_id, p.ts,
              (SELECT max(c.ts) FROM c
               WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS clicked_at
            FROM p)
      SELECT m.event_id, m.user_id, m.ts, m.clicked_at, c.click_id,
             epoch_us(m.ts) - epoch_us(m.clicked_at) AS gap_us
      FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.ts = m.clicked_at
      ORDER BY m.event_id""")),

    // ---- interval/range self-join, bucket-blocked on the Spark side --
    ("w04_range_join", (s: SparkSession, d: String) => {
      val e = t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val window = 60000000L // 60s in micros
      val a = e.select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"))
        .withColumn("bkt", explode(array(
          (col("a_us") / window).cast("long"),
          (col("a_us") / window).cast("long") + 1)))
      val b = e.select(col("user_id"), col("event_id").as("b_id"), col("us").as("b_us"))
        .withColumn("bkt", (col("b_us") / window).cast("long"))
      a.join(b, Seq("user_id", "bkt"))
        .filter((col("b_us") > col("a_us") ||
                 (col("b_us") === col("a_us") && col("b_id") > col("a_id"))) &&
                col("b_us") - col("a_us") <= window)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT a.user_id, COUNT(*) AS n_pairs
      FROM events a JOIN events b ON a.user_id = b.user_id
        AND (epoch_us(b.ts) > epoch_us(a.ts)
             OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id > a.event_id))
        AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
      GROUP BY a.user_id ORDER BY a.user_id""")),

    // ---- k-NN label prediction over the ANN top-k ---------------------
    // majority label among the 5 nearest labeled vectors (ties -> the
    // smaller label): exact integers over exact cosine ordering
    ("s05_knn_classify", (s: SparkSession, d: String) => {
      val topk = graft.ext.Similarity
        .bruteForceTopK(t(s, d, "embeddings"), nQueries = 10, k = 5)
      val labels = t(s, d, "embeddings").select(
        col("vec_id").as("neighbor_id"), col("label"))
      val votes = topk.join(labels, "neighbor_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("n_votes").desc, col("label"))
      votes.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("label").as("predicted_label"),
          col("n_votes"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, label,
                        ${graft.ext.Similarity.normSql("embedding")} AS nrm FROM embeddings),
      sc AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id, t.label,
                    ${graft.ext.Similarity.dotSql("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
             FROM e q JOIN e t ON q.vec_id < 10 AND t.vec_id >= 10),
      topk AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM sc) z
               WHERE rn <= 5),
      votes AS (SELECT query_id, label, COUNT(*) AS n_votes
                FROM topk GROUP BY query_id, label)
      SELECT query_id, label AS predicted_label, n_votes
      FROM (SELECT *, ROW_NUMBER() OVER
              (PARTITION BY query_id ORDER BY n_votes DESC, label) AS rk FROM votes) v
      WHERE rk = 1 ORDER BY query_id""")),

    // ---- TF-IDF-ish top terms (multiplicative idf: tf * N/df) --------
    ("t05_tfidf_top_terms", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val words = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val tf = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val dfreq = words.groupBy(col("w"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "w").crossJoin(broadcast(n))
        .withColumn("score",
          col("tf") * (col("n_docs").cast("double") / col("df")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("w"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("w").as("term"),
          col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"), col("rn"))
    }, Some("""
      WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
      dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, w, tf, df,
                        tf * (CAST(n_docs AS DOUBLE) / df) AS score
                 FROM tf JOIN dfreq USING (w) CROSS JOIN n)
      SELECT doc_id, rn, w AS term, tf, df, score
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS INT) AS rn
            FROM scored) z
      WHERE rn <= 3 ORDER BY doc_id, rn""")),

    // ---- BPE merge training: 3 exact merge iterations over the
    // top-200 word dictionary. Each iteration = explode + partial-agg
    // groupBy + a 1-row argmax collect (the bounded-collect contract);
    // the oracle unrolls the same iterations as CTE chains, with the
    // " a  b " -> " ab " delimiter scheme making the leftmost-non-
    // overlapping merge identical string semantics in both engines ----
    ("t17_bpe_merges", (s: SparkSession, d: String) =>
      graft.ext.TextAnalysis.bpeMerges(t(s, d, "documents"),
        vocabTop = 200, iters = 3),
      Some {
      val iterCtes = (1 to 3).map { i =>
        s"""sy$i AS (SELECT freq, string_split(trim(seq), '  ') AS sy FROM v${i - 1}
               WHERE len(string_split(trim(seq), '  ')) > 1),
        pc$i AS (SELECT p[1] AS a, p[2] AS b, SUM(freq) AS cnt
                 FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
                         j -> [sy[j], sy[j+1]])) AS p FROM sy$i) q
                 GROUP BY 1, 2),
        tp$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1),
        v$i AS (SELECT word, freq,
                  replace(seq,
                    ' ' || (SELECT a FROM tp$i) || '  ' || (SELECT b FROM tp$i) || ' ',
                    ' ' || (SELECT a FROM tp$i) || (SELECT b FROM tp$i) || ' ') AS seq
                FROM v${i - 1})"""
      }.mkString(",\n        ")
      s"""
      WITH wf AS (SELECT wd AS word, COUNT(*) AS freq
                  FROM (SELECT unnest(string_split(text, ' ')) AS wd
                        FROM documents) u
                  WHERE regexp_matches(wd, '^[a-z]+$$') GROUP BY wd),
      v0 AS (SELECT word, freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq
             FROM wf ORDER BY freq DESC, word LIMIT 200),
      $iterCtes
      SELECT * FROM (
        SELECT 1 AS iter, a AS sym_a, b AS sym_b, CAST(cnt AS BIGINT) AS pair_count FROM tp1
        UNION ALL
        SELECT 2, a, b, CAST(cnt AS BIGINT) FROM tp2
        UNION ALL
        SELECT 3, a, b, CAST(cnt AS BIGINT) FROM tp3) z
      ORDER BY iter"""
    }),

    // ---- BPE train-then-apply: tokenize the corpus with the learned
    // merges, per-language compression report. The oracle re-learns
    // the same three merges (t17's CTE chain) and applies the same
    // replace chain to every word ------------------------------------
    ("t18_bpe_tokenize", (s: SparkSession, d: String) =>
      graft.ext.TextAnalysis.bpeTokenize(t(s, d, "documents"),
        vocabTop = 200, iters = 3),
      Some {
      val iterCtes = (1 to 3).map { i =>
        s"""sy$i AS (SELECT freq, string_split(trim(seq), '  ') AS sy FROM v${i - 1}
               WHERE len(string_split(trim(seq), '  ')) > 1),
        pc$i AS (SELECT p[1] AS a, p[2] AS b, SUM(freq) AS cnt
                 FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
                         j -> [sy[j], sy[j+1]])) AS p FROM sy$i) q
                 GROUP BY 1, 2),
        tp$i AS (SELECT a, b, cnt FROM pc$i ORDER BY cnt DESC, a, b LIMIT 1),
        v$i AS (SELECT word, freq,
                  replace(seq,
                    ' ' || (SELECT a FROM tp$i) || '  ' || (SELECT b FROM tp$i) || ' ',
                    ' ' || (SELECT a FROM tp$i) || (SELECT b FROM tp$i) || ' ') AS seq
                FROM v${i - 1})"""
      }.mkString(",\n        ")
      val applied = (1 to 3).foldLeft(
          "regexp_replace(word, '(.)', ' \\1 ', 'g')") { (acc, i) =>
        s"""replace($acc,
             ' ' || (SELECT a FROM tp$i) || '  ' || (SELECT b FROM tp$i) || ' ',
             ' ' || (SELECT a FROM tp$i) || (SELECT b FROM tp$i) || ' ')"""
      }
      s"""
      WITH wf AS (SELECT wd AS word, COUNT(*) AS freq
                  FROM (SELECT unnest(string_split(text, ' ')) AS wd
                        FROM documents) u
                  WHERE regexp_matches(wd, '^[a-z]+$$') GROUP BY wd),
      v0 AS (SELECT word, freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq
             FROM wf ORDER BY freq DESC, word LIMIT 200),
      $iterCtes,
      dw AS (SELECT lang, unnest(string_split(text, ' ')) AS word
             FROM documents),
      tok AS (SELECT lang, CAST(length(word) AS BIGINT) AS n_chars,
                     CAST(len(string_split(trim($applied), '  ')) AS BIGINT)
                       AS n_units
              FROM dw)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(SUM(n_units) AS BIGINT) AS n_units,
             CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_units) AS DOUBLE)
               AS chars_per_unit
      FROM tok GROUP BY lang ORDER BY lang"""
    }),

    // ---- BM25-style sparse retrieval (rational idf / N; fixed-point
    // per-doc sums so the score is order-independent and the rank ties
    // on an integer in both engines) --------------------------------
    ("t16_bm25_topk", (s: SparkSession, d: String) =>
      graft.ext.TextAnalysis.bm25TopK(t(s, d, "documents"),
        nQueries = 5, topK = 10),
      Some("""
      WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tgt AS (SELECT * FROM words WHERE doc_id >= 5),
      tf AS (SELECT doc_id AS t_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tgt GROUP BY 1, 2),
      dl AS (SELECT doc_id AS t_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tgt GROUP BY 1),
      dfreq AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tgt GROUP BY 1),
      stats AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                       CAST(COUNT(*) AS BIGINT) AS n_words FROM tgt),
      qt AS (SELECT DISTINCT doc_id AS q_id, w FROM words WHERE doc_id < 5),
      ts AS (SELECT qt.q_id, tf.t_id,
               (((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                 / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) / CAST(n_docs AS DOUBLE))
               * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                  / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                        * (CAST(dl AS DOUBLE)
                           / (CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
               AS term_score
             FROM qt JOIN tf ON tf.w = qt.w
                     JOIN dfreq ON dfreq.w = qt.w
                     JOIN dl ON dl.t_id = tf.t_id
                     CROSS JOIN stats),
      agg AS (SELECT q_id, t_id,
                CAST(SUM(CAST(floor(term_score * CAST(1099511627776 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s
              FROM ts GROUP BY 1, 2),
      ranked AS (SELECT q_id, t_id, s,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, t_id) AS rn
                 FROM agg)
      SELECT q_id AS query_id, t_id AS neighbor_id,
             CAST(s AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS score,
             CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= 10 ORDER BY query_id, rn""")),

    // ---- forward as-of with tolerance: click -> next purchase at or
    // after, nulled when the gap exceeds 30 min (conversion latency).
    // Same single-shuffle tagged-union window as a01, scanning in
    // descending event time; tolerance is a post-filter, so ONE pass
    // serves any tolerance. Oracle: correlated min-ts subquery with
    // the tolerance folded into the range --------------------------
    ("a03_asof_tolerance", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("click_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      val tolUs = 30L * 60 * 1000 * 1000
      val within = col("asof_ts").isNotNull &&
        unix_micros(col("asof_ts")) - unix_micros(col("ts")) <= tolUs
      AsOfJoin.firstAfter(clicks, purchases, "user_id", "ts",
          Seq("purchase_id"))
        .select(col("click_id"), col("user_id"), col("ts"),
          when(within, col("asof_ts")).as("conv_ts"),
          when(within, col("asof_purchase_id")).as("purchase_id"),
          when(within,
            unix_micros(col("asof_ts")) - unix_micros(col("ts")))
            .as("gap_us"))
        .orderBy(col("click_id"))
    }, Some("""
      WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      p AS (SELECT user_id, ts, max(event_id) AS purchase_id
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      m AS (SELECT c.click_id, c.user_id, c.ts,
              (SELECT min(p.ts) FROM p
               WHERE p.user_id = c.user_id AND p.ts >= c.ts
                 AND p.ts <= c.ts + INTERVAL 30 MINUTE) AS conv_ts
            FROM c)
      SELECT m.click_id, m.user_id, m.ts, m.conv_ts, p.purchase_id,
             epoch_us(m.conv_ts) - epoch_us(m.ts) AS gap_us
      FROM m LEFT JOIN p ON p.user_id = m.user_id AND p.ts = m.conv_ts
      ORDER BY m.click_id""")),

    // ---- nearest as-of: |gap|-minimizing match in either direction,
    // ties backward — the backward + forward passes composed, the
    // third member of the as-of family (a01 backward, a03 forward
    // w/ tolerance). Oracle: correlated max/min subqueries + the same
    // tie rule ------------------------------------------------------
    ("a04_asof_nearest", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.nearest(purchases, clicks, "user_id", "ts", Seq("click_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("near_ts"),
          col("asof_click_id").as("click_id"),
          (unix_micros(col("asof_ts")) - unix_micros(col("ts")))
            .as("gap_us"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      p AS (SELECT event_id, user_id, ts
            FROM events WHERE event_type = 'purchase'),
      m AS (SELECT p.event_id, p.user_id, p.ts,
              (SELECT max(c.ts) FROM c
               WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS b_ts,
              (SELECT min(c.ts) FROM c
               WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS f_ts
            FROM p),
      pick AS (SELECT event_id, user_id, ts,
                 CASE WHEN f_ts IS NULL THEN b_ts
                      WHEN b_ts IS NOT NULL
                           AND epoch_us(ts) - epoch_us(b_ts)
                               <= epoch_us(f_ts) - epoch_us(ts) THEN b_ts
                      ELSE f_ts END AS near_ts
               FROM m)
      SELECT pick.event_id, pick.user_id, pick.ts, near_ts, c.click_id,
             epoch_us(near_ts) - epoch_us(pick.ts) AS gap_us
      FROM pick LEFT JOIN c ON c.user_id = pick.user_id
                           AND c.ts = pick.near_ts
      ORDER BY pick.event_id""")),

    // ---- k-truss peel (k=4, 2 rounds): edges must sit in >= 2
    // triangles among survivors — the edge-cohesion gate after g06's
    // node-degree core; star spokes shed immediately. Oracle unrolls
    // the identical wedge-join + support recount per round ----------
    ("g16_ktruss", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.kTruss(eventEdges(s, d), k = 4, iters = 2)
    }, Some {
      def round(r: Int): String = {
        val p = r - 1
        s"""t$r AS MATERIALIZED (SELECT w.x, w.y, w.z FROM (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e$p e1 JOIN e$p e2 ON e1.a = e2.a AND e1.b < e2.b) w
            JOIN e$p e3 ON e3.a = w.y AND e3.b = w.z),
      s$r AS MATERIALIZED (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup FROM (
                SELECT x AS a, y AS b FROM t$r
                UNION ALL SELECT x, z FROM t$r
                UNION ALL SELECT y, z FROM t$r) u GROUP BY a, b),
      e$r AS MATERIALIZED (SELECT e.a, e.b FROM e$p e
              JOIN s$r s ON s.a = e.a AND s.b = e.b WHERE s.sup >= 2)"""
      }
      s"""
      WITH $eventEdgesCtes,
      e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
               GREATEST(src, dst) AS b
             FROM ed WHERE src <> dst),
      ${round(1)},
      ${round(2)},
      ${round(3)}
      SELECT e2.a, e2.b, s3.sup
      FROM e2 JOIN s3 ON s3.a = e2.a AND s3.b = e2.b
      ORDER BY e2.a, e2.b"""
    }),

    // ---- bounded-radius centrality (closeness / harmonic /
    // eccentricity) from ONE multi-source BFS — the g05 frontier loop
    // with a seed dimension; harmonic's 1/d terms fold in ascending-
    // hop order over the per-distance histogram. Oracle unrolls the
    // same min-expansion recurrence with a seed column --------------
    ("g15_centrality", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      Graphs.centrality(eventEdges(s, d).cpGuard(), maxHops = 3)
    }, Some {
      val iterCtes = (1 to 3).map { i =>
        s"""d$i AS (SELECT seed, k, MIN(hop) AS hop FROM (
                SELECT seed, k, hop FROM d${i - 1}
                UNION ALL
                SELECT p.seed, ed.dst AS k, p.hop + 1
                FROM ed JOIN d${i - 1} p ON ed.src = p.k) u
              GROUP BY seed, k)"""
      }.mkString(",\n      ")
      s"""
      WITH $eventEdgesCtes,
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      d0 AS (SELECT k AS seed, k, 0 AS hop FROM nodes),
      $iterCtes,
      hc AS (SELECT seed, hop, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM d3 WHERE hop > 0 GROUP BY seed, hop),
      agg AS (SELECT seed,
                CAST(SUM(cnt) AS BIGINT) AS n_reached,
                CAST(SUM(cnt * hop) AS BIGINT) AS sum_hops,
                CAST(MAX(hop) AS INT) AS ecc,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(CAST(cnt AS DOUBLE) / CAST(hop AS DOUBLE)
                       ORDER BY hop)), (a, b) -> a + b) AS harmonic
              FROM hc GROUP BY seed)
      SELECT nodes.k, COALESCE(n_reached, 0) AS n_reached,
             COALESCE(sum_hops, 0) AS sum_hops,
             COALESCE(ecc, 0) AS ecc,
             CASE WHEN sum_hops > 0
               THEN CAST(n_reached AS DOUBLE) / CAST(sum_hops AS DOUBLE)
             END AS closeness,
             COALESCE(harmonic, CAST(0.0 AS DOUBLE)) AS harmonic
      FROM nodes LEFT JOIN agg ON agg.seed = nodes.k
      ORDER BY k"""
    }),

    // ---- per-user EMA: the recursive smoother as ONE hash aggregation
    // (ordered collect + left fold) — the exact IEEE sequence DuckDB's
    // list_reduce performs, so the floats hash-match; no window pass,
    // per-key state = that key's rows ------------------------------
    ("w23_ema", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.ema(t(s, d, "events"), alpha = 0.25),
      Some("""
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> acc + 0.25 * (x - acc)) AS ema
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- time-weighted average: value holds until the next event;
    // weights are whole seconds (integer-division of the us gap), the
    // weighted sum is an exact BIGINT in cents*seconds — below 2^53,
    // so both engines' int->double conversions are exact — divided
    // once. (A DECIMAL-typed sum whose storage passes 2^53 double-
    // rounds in DuckDB's decimal->double cast.) ---------------------
    ("w24_time_weighted_avg", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.timeWeightedAvg(t(s, d, "events")),
      Some("""
      WITH o AS (SELECT user_id, value, epoch_us(ts) AS us,
                   LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_us
                 FROM events),
      i AS (SELECT user_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                   (next_us - us) // 1000000 AS dur_s
            FROM o WHERE next_us IS NOT NULL)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
             CAST(SUM(dur_s) AS BIGINT) AS total_s,
             CAST(SUM(cents * dur_s) AS DOUBLE)
               / CAST(SUM(dur_s) * 100 AS DOUBLE) AS twa
      FROM i GROUP BY user_id
      HAVING SUM(dur_s) > 0 ORDER BY user_id""")),

    // ---- inter-arrival gap profile (bot-cadence fingerprint): all
    // integers except one division; the median is RANK-selected from
    // the sorted gap list, never interpolated ------------------------
    ("w26_gap_stats", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.gapStats(t(s, d, "events")),
      Some("""
      WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                   LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_us
                 FROM events),
      i AS (SELECT user_id, next_us - us AS gap_us
            FROM o WHERE next_us IS NOT NULL)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
             CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
             list(gap_us ORDER BY gap_us)[CAST((COUNT(*) + 1) // 2 AS INT)]
               AS p50_gap_us,
             CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_gap_us
      FROM i GROUP BY user_id ORDER BY user_id""")),

    // ---- inter-arrival burstiness (squared CV of per-user gaps):
    // CV² = 1 Poisson, -> 0 metronome automation, > 1 scrape-then-
    // sleep; DECIMAL(38,0) moments, BIGINT edges, S>0-guarded IEEE
    // division --------------------------------------------------------
    ("w43_gap_burstiness", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.gapBurstiness(t(s, d, "events")),
      Some("""
      WITH o AS (SELECT user_id, epoch_us(ts) AS us,
                   LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_us
                 FROM events),
      i AS (SELECT user_id, CAST(next_us - us AS HUGEINT) AS g
            FROM o WHERE next_us IS NOT NULL),
      a AS (SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
              SUM(g) AS s, SUM(g * g) AS s2
            FROM i GROUP BY user_id)
      SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
             CASE WHEN s > 0
                  THEN CAST((n * s2 - s * s) * 1000000 // (s * s) AS BIGINT)
             END AS cv2_ppm,
             CASE WHEN s > 0
                  THEN CAST(n * s2 - s * s AS DOUBLE)
                    / CAST(s * s AS DOUBLE) END AS cv2
      FROM a ORDER BY user_id""")),

    // ---- one-sided CUSUM upward-shift detector: s_i = max(0,
    // s_{i-1} + x_i - k), alarm when s > h — computed WITHOUT the
    // recursion via the prefix identity s_i = P_i - min(0, runmin P),
    // two same-spec window passes in pure BIGINT cents --------------
    ("w27_cusum", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.cusum(t(s, d, "events"),
        kCents = 6000L, hCents = 20000L),
      Some("""
      WITH c AS (SELECT user_id, ts, event_id,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cents
                 FROM events),
      pr AS (SELECT user_id, ts, event_id, cents,
               SUM(cents - 6000) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
             FROM c),
      pp AS (SELECT user_id, cents, p,
               MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS runmin
             FROM pr),
      st AS (SELECT user_id, cents, p,
               p - LEAST(CAST(0 AS BIGINT), runmin) AS s
             FROM pp)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN s > 20000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarms,
             CAST((CAST(SUM(cents) AS BIGINT) - COUNT(*) * 6000)
               - LEAST(CAST(0 AS BIGINT), MIN(p)) AS BIGINT)
               AS final_cusum_cents
      FROM st GROUP BY user_id ORDER BY user_id""")),

    // ---- seasonal robust outliers: per hour-of-day rank-selected
    // median + MAD in exact cents, events flagged beyond 3 MADs of
    // their hour's baseline — w13's robust discipline with a seasonal
    // baseline ------------------------------------------------------
    ("w28_seasonal_outliers", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.seasonalOutliers(t(s, d, "events")),
      Some("""
      WITH ev AS (SELECT event_id, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                  FROM events),
      r1 AS (SELECT hod, cents,
               ROW_NUMBER() OVER (PARTITION BY hod
                 ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY hod) AS cnt
             FROM ev),
      med AS (SELECT hod, cents AS med_cents
              FROM r1 WHERE rn = (cnt + 1) // 2),
      wm AS (SELECT ev.event_id, ev.hod, ev.cents, med_cents,
               abs(ev.cents - med_cents) AS adev
             FROM ev JOIN med USING (hod)),
      r2 AS (SELECT hod, adev,
               ROW_NUMBER() OVER (PARTITION BY hod
                 ORDER BY adev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY hod) AS cnt
             FROM wm),
      mad AS (SELECT hod, adev AS mad_cents
              FROM r2 WHERE rn = (cnt + 1) // 2)
      SELECT hod, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(med_cents) AS med_cents, MAX(mad_cents) AS mad_cents,
             CAST(SUM(CASE WHEN adev > 3 * mad_cents THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers
      FROM wm JOIN mad USING (hod) GROUP BY hod ORDER BY hod""")),

    // ---- OHLC bars per (user, hour): first/last in the (ts, event_id)
    // total order via one full-frame window pass, volume in exact
    // decimal ------------------------------------------------------
    ("w25_ohlc", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.ohlc(t(s, d, "events")),
      Some("""
      WITH b AS (SELECT user_id, date_trunc('hour', ts) AS hour, value,
                   FIRST_VALUE(value) OVER (PARTITION BY user_id, date_trunc('hour', ts)
                     ORDER BY ts, event_id) AS open_,
                   LAST_VALUE(value) OVER (PARTITION BY user_id, date_trunc('hour', ts)
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_
                 FROM events)
      SELECT user_id, hour, MAX(open_) AS open, MAX(value) AS high,
             MIN(value) AS low, MAX(close_) AS close,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY user_id, hour ORDER BY user_id, hour""")),

    // ---- per-user autocorrelation at lags 1..3: exact-integer ACF
    // via the deviation identity d_i = n*c_i - S (the 1/n factors
    // cancel in the ratio), floor(r_k*1024) by portable floored
    // division. One shuffle on user_id; lags unpivot post-agg -------
    ("w29_acf", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.acf(t(s, d, "events"), maxLag = 3),
      Some("""
      WITH b AS (SELECT user_id, ts, event_id,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      d0 AS (SELECT user_id, ts, event_id, cents,
          COUNT(*) OVER (PARTITION BY user_id) AS n,
          SUM(cents) OVER (PARTITION BY user_id) AS s FROM b),
      dd AS (SELECT user_id, ts, event_id, n, n*cents - s AS d FROM d0),
      led AS (SELECT user_id, n, d,
          LEAD(d, 1) OVER w AS d1, LEAD(d, 2) OVER w AS d2,
          LEAD(d, 3) OVER w AS d3
        FROM dd WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      a AS (SELECT user_id, MAX(n) AS n, SUM(d*d) AS den,
          SUM(d*d1) AS num1, COUNT(d1) AS np1,
          SUM(d*d2) AS num2, COUNT(d2) AS np2,
          SUM(d*d3) AS num3, COUNT(d3) AS np3 FROM led GROUP BY 1),
      u AS (SELECT user_id, n, den, 1 AS lag, num1 AS num, np1 AS n_pairs FROM a
        UNION ALL SELECT user_id, n, den, 2, num2, np2 FROM a
        UNION ALL SELECT user_id, n, den, 3, num3, np3 FROM a)
      SELECT user_id, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
        CAST(n_pairs AS BIGINT) AS n_pairs,
        CAST((num*1024 - ((num*1024 % den) + den) % den) // den AS BIGINT)
          AS acf_q
      FROM u WHERE den > 0 AND n_pairs > 0 ORDER BY user_id, lag""")),

    // ---- strongly connected components over the top-150-edge
    // transition backbone: engine runs Pregel FW-BW coloring with
    // trim; the oracle computes the full transitive closure (the
    // backbone is ~100 nodes, so closure is cheap in DuckDB) and reads
    // SCCs off mutual reachability — algorithm-independent truth -----
    ("g17_scc", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val backbone = eventEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .orderBy(col("w").desc, col("src"), col("dst")).limit(150)
        .select(col("src"), col("dst"))
      Graphs.scc(backbone)
    }, Some(s"""
      WITH $eventEdgesCtes,
      ed2 AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 150)),
      rk AS (WITH RECURSIVE reach AS (
          SELECT src AS a, dst AS b FROM ed2
          UNION
          SELECT r.a, e.dst FROM reach r JOIN ed2 e ON r.b = e.src
        ) SELECT * FROM reach),
      mut AS (SELECT r1.a AS k, r1.b AS v FROM rk r1
              JOIN rk r2 ON r1.a = r2.b AND r1.b = r2.a),
      scc0 AS (SELECT k, LEAST(k, MIN(v)) AS scc_id FROM mut GROUP BY k),
      an AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM ed2 UNION ALL SELECT dst FROM ed2)),
      scc AS (SELECT an.k, COALESCE(s0.scc_id, an.k) AS scc_id
              FROM an LEFT JOIN scc0 s0 USING (k)),
      sz AS (SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS scc_size
             FROM scc GROUP BY 1)
      SELECT scc.k, scc.scc_id, sz.scc_size
      FROM scc JOIN sz USING (scc_id) ORDER BY k""")),

    // ---- exact betweenness centrality over the g17 backbone: ONE
    // multi-source level-synchronous BFS builds the all-pairs
    // (s, v, d, sigma) table, then the pair-dependency identity
    // bc(v) = sum floor(sigma_sv * sigma_vt * 2^20 / sigma_st) over
    // triples with d_sv + d_vt = d_st — integer terms in BOTH engines
    // (oracle unrolls the BFS levels with the engine's exact
    // frontier/anti-join semantics, so sigma never counts a
    // non-shortest walk and cannot overflow where the engine doesn't);
    // non-closure within the shared unroll bound fails loudly --------
    ("g27_betweenness", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val backbone = eventEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .orderBy(col("w").desc, col("src"), col("dst")).limit(150)
        .select(col("src"), col("dst"))
      Graphs.betweenness(backbone, maxRounds = 32)
    }, Some {
      def levelCtes(i: Int): String =
        s"""x$i AS (SELECT l.s, e.dst AS v, CAST(SUM(l.cnt) AS BIGINT) AS cnt
              FROM l${i - 1} l JOIN e ON l.v = e.src
              GROUP BY l.s, e.dst),
        l$i AS MATERIALIZED (SELECT s, v, cnt FROM x$i
              WHERE NOT EXISTS (SELECT 1 FROM r${i - 1} r
                                WHERE r.s = x$i.s AND r.v = x$i.v)),
        r$i AS MATERIALIZED (SELECT s, v FROM r${i - 1}
              UNION ALL SELECT s, v FROM l$i)"""
      s"""
      WITH $eventEdgesCtes,
      ed2 AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 150)),
      e AS (SELECT DISTINCT src, dst FROM ed2),
      nd AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM e UNION ALL SELECT dst FROM e)),
      l0 AS (SELECT k AS s, k AS v, CAST(1 AS BIGINT) AS cnt FROM nd),
      r0 AS (SELECT s, v FROM l0),
      ${(1 to 32).map(levelCtes).mkString(",\n      ")},
      sp AS MATERIALIZED (${(0 to 32).map(i =>
        s"SELECT s, v, $i AS d, cnt AS sigma FROM l$i")
        .mkString("\n        UNION ALL ")}),
      tri AS (SELECT p1.v,
                p1.sigma * p2.sigma * CAST(1048576 AS BIGINT) // p3.sigma
                  AS term
              FROM sp p1
              JOIN sp p2 ON p2.s = p1.v AND p2.d >= 1
              JOIN sp p3 ON p3.s = p1.s AND p3.v = p2.v
                        AND p3.d = p1.d + p2.d
              WHERE p1.d >= 1)
      SELECT nd.k, CAST(COALESCE(SUM(tri.term), 0) AS BIGINT) AS bc_q
      FROM nd LEFT JOIN tri ON tri.v = nd.k
      GROUP BY nd.k ORDER BY nd.k"""
    }),

    // ---- SAMPLED betweenness (Brandes-Pich pivots) — g27's scale
    // path made real: 8 hash-deterministic pivot seeds, one forward +
    // one backward sigma-BFS from the seeds only (state O(K*n), no
    // maxNodes bound), the SAME floored pair-dependency triples
    // restricted to pivot pairs, extrapolated by n(n-1)/(K(K-1))
    // integral div; oracle unrolls BOTH BFS pyramids from the same
    // seed rule, value-exact ----------------------------------------
    ("g28_betweenness_sampled", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val backbone = eventEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .orderBy(col("w").desc, col("src"), col("dst")).limit(150)
        .select(col("src"), col("dst"))
      Graphs.betweennessSampled(backbone, numSources = 8, maxRounds = 32)
    }, Some {
      def lvl(pfx: String, et: String)(i: Int): String =
        s"""${pfx}x$i AS (SELECT l.s, e.dst AS v,
              CAST(SUM(l.cnt) AS BIGINT) AS cnt
              FROM ${pfx}l${i - 1} l JOIN $et e ON l.v = e.src
              GROUP BY l.s, e.dst),
        ${pfx}l$i AS MATERIALIZED (SELECT s, v, cnt FROM ${pfx}x$i
              WHERE NOT EXISTS (SELECT 1 FROM ${pfx}r${i - 1} r
                                WHERE r.s = ${pfx}x$i.s
                                  AND r.v = ${pfx}x$i.v)),
        ${pfx}r$i AS MATERIALIZED (SELECT s, v FROM ${pfx}r${i - 1}
              UNION ALL SELECT s, v FROM ${pfx}l$i)"""
      def pyramid(pfx: String, et: String): String =
        s"""${pfx}l0 AS (SELECT k AS s, k AS v, CAST(1 AS BIGINT) AS cnt
              FROM sd),
      ${pfx}r0 AS (SELECT s, v FROM ${pfx}l0),
      ${(1 to 32).map(lvl(pfx, et)).mkString(",\n      ")},
      sp$pfx AS MATERIALIZED (${(0 to 32).map(i =>
          s"SELECT s, v, $i AS d, cnt AS sigma FROM ${pfx}l$i")
          .mkString("\n        UNION ALL ")})"""
      s"""
      WITH $eventEdgesCtes,
      ed2 AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 150)),
      e AS (SELECT DISTINCT src, dst FROM ed2),
      er AS (SELECT dst AS src, src AS dst FROM e),
      nd AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM e UNION ALL SELECT dst FROM e)),
      sd AS MATERIALIZED (SELECT k FROM nd
             ORDER BY (k * 48271) % 2147483647, k LIMIT 8),
      sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(LEAST(8, COUNT(*)) AS BIGINT) AS kk FROM nd),
      ${pyramid("f", "e")},
      ${pyramid("b", "er")},
      tri AS (SELECT p1.v,
                p1.sigma * p2.sigma * CAST(1048576 AS BIGINT) // p3.sigma
                  AS term
              FROM spf p1
              JOIN spb p2 ON p2.v = p1.v AND p2.d >= 1
              JOIN spf p3 ON p3.s = p1.s AND p3.v = p2.s
                         AND p3.d = p1.d + p2.d
              WHERE p1.d >= 1)
      SELECT nd.k, CAST(COALESCE(SUM(tri.term), 0) AS BIGINT) AS bc_raw_q,
        CAST(CAST(COALESCE(SUM(tri.term), 0) AS BIGINT)
          * MAX(sc.nn) * (MAX(sc.nn) - 1)
          // (MAX(sc.kk) * (MAX(sc.kk) - 1)) AS BIGINT) AS bc_est_q
      FROM nd LEFT JOIN tri ON tri.v = nd.k CROSS JOIN sc
      GROUP BY nd.k ORDER BY nd.k"""
    }),

    // ---- SOURCE-ONLY sampled betweenness (Brandes-Pich n/K) — the
    // backward δ-recursion in its per-edge FLOORED fixed-point form:
    // δq(s,v) = Σ over shortest-path successors w of
    // floor(σ_sv·(2^20 + δq(s,w)) / σ_sw), one floor per edge then
    // exact BIGINT sums, so the value is order-independent and both
    // engines agree bit for bit; bc_raw = Σ_s δq, extrapolated by n/K.
    // The oracle unrolls the forward σ-BFS pyramid and the backward
    // sweep level by level --------------------------------------------
    ("g29_betweenness_source", (s: SparkSession, d: String) => {
      import graft.ext.Graphs
      val backbone = eventEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .orderBy(col("w").desc, col("src"), col("dst")).limit(150)
        .select(col("src"), col("dst"))
      Graphs.betweennessSource(backbone, numSources = 8, maxRounds = 32)
    }, Some {
      def lvl(i: Int): String =
        s"""fx$i AS (SELECT l.s, e.dst AS v,
              CAST(SUM(l.cnt) AS BIGINT) AS cnt
              FROM fl${i - 1} l JOIN e ON l.v = e.src
              GROUP BY l.s, e.dst),
        fl$i AS MATERIALIZED (SELECT s, v, cnt FROM fx$i
              WHERE NOT EXISTS (SELECT 1 FROM fr${i - 1} r
                                WHERE r.s = fx$i.s AND r.v = fx$i.v)),
        fr$i AS MATERIALIZED (SELECT s, v FROM fr${i - 1}
              UNION ALL SELECT s, v FROM fl$i)"""
      // backward δ sweep: level 32 initializes at 0; each level's δ is
      // the floored per-successor-edge sum; level 0 (v = s) is never
      // accumulated — Brandes sums only w ≠ s
      def dl(l: Int): String =
        s"""dl$l AS MATERIALIZED (SELECT c.s, c.v,
              CAST(COALESCE(SUM(
                (c.cnt * (1048576 + dn.dq)) // w.cnt), 0) AS BIGINT) AS dq
              FROM fl$l c
              LEFT JOIN e ON e.src = c.v
              LEFT JOIN fl${l + 1} w ON w.s = c.s AND w.v = e.dst
              LEFT JOIN dl${l + 1} dn ON dn.s = w.s AND dn.v = w.v
              GROUP BY c.s, c.v)"""
      s"""
      WITH $eventEdgesCtes,
      ed2 AS MATERIALIZED (SELECT src, dst FROM
        (SELECT * FROM ed WHERE src <> dst
         ORDER BY w DESC, src, dst LIMIT 150)),
      e AS (SELECT DISTINCT src, dst FROM ed2),
      nd AS (SELECT DISTINCT k FROM
             (SELECT src AS k FROM e UNION ALL SELECT dst FROM e)),
      sd AS MATERIALIZED (SELECT k FROM nd
             ORDER BY (k * 48271) % 2147483647, k LIMIT 8),
      sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(LEAST(8, COUNT(*)) AS BIGINT) AS kk FROM nd),
      fl0 AS (SELECT k AS s, k AS v, CAST(1 AS BIGINT) AS cnt FROM sd),
      fr0 AS (SELECT s, v FROM fl0),
      ${(1 to 32).map(lvl).mkString(",\n      ")},
      dl32 AS (SELECT s, v, CAST(0 AS BIGINT) AS dq FROM fl32),
      ${(31 to 1 by -1).map(dl).mkString(",\n      ")},
      dall AS (${(1 to 32).map(l => s"SELECT s, v, dq FROM dl$l")
          .mkString("\n        UNION ALL ")}),
      bcx AS (SELECT v, CAST(SUM(dq) AS BIGINT) AS bc_raw FROM dall
              GROUP BY v)
      SELECT nd.k,
        CAST(COALESCE(MAX(bcx.bc_raw), 0) AS BIGINT) AS bc_raw_q,
        CAST(COALESCE(MAX(bcx.bc_raw), 0) * MAX(sc.nn) // MAX(sc.kk)
          AS BIGINT) AS bc_est_q
      FROM nd LEFT JOIN bcx ON bcx.v = nd.k CROSS JOIN sc
      GROUP BY nd.k ORDER BY nd.k"""
    }),

    // ---- Theil-Sen robust slope per user: lower median of pairwise
    // cents-per-hour slopes, portable floored division; the per-user
    // self-join is shuffle-hash on user_id with pair count bounded by
    // the per-key row count ----------------------------------------
    ("w30_theil_sen", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.theilSen(t(s, d, "events")),
      Some("""
      WITH b AS (SELECT user_id, epoch_us(ts) AS us, event_id,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      p AS (SELECT a.user_id, (c.cents - a.cents) * 3600000000 AS q,
              c.us - a.us AS dt
            FROM b a JOIN b c ON a.user_id = c.user_id AND a.us < c.us),
      sl AS (SELECT user_id,
               CAST((q - ((q % dt) + dt) % dt) // dt AS BIGINT) AS slope_cph
             FROM p),
      r AS (SELECT user_id, slope_cph,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY slope_cph) AS rn,
              COUNT(*) OVER (PARTITION BY user_id) AS np FROM sl)
      SELECT user_id, CAST(MAX(np) AS BIGINT) AS n_pairs,
        CAST(MIN(slope_cph) AS BIGINT) AS min_slope,
        CAST(MAX(slope_cph) AS BIGINT) AS max_slope,
        CAST(MAX(CASE WHEN rn = (np + 1) // 2 THEN slope_cph END)
          AS BIGINT) AS sen_slope_cph
      FROM r GROUP BY user_id ORDER BY user_id""")),

    // ---- exact two-sample Kolmogorov-Smirnov drift statistic
    // (before/after the w19 cut): max CDF gap in cross-multiplied
    // BIGINTs over the distinct pooled values, one IEEE division at
    // the read edge; cumulative counts are range-partitioned
    // PrefixSum, never an unpartitioned window ----------------------
    ("w31_ks_test", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.ksTest(t(s, d, "events"),
        "TIMESTAMP '2024-01-16 00:00:00'"),
      Some("""
      WITH b AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
                 ts < TIMESTAMP '2024-01-16 00:00:00' AS ha FROM events),
      per AS (SELECT cents,
                CAST(SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT) AS na,
                CAST(SUM(CASE WHEN ha THEN 0 ELSE 1 END) AS BIGINT) AS nb
              FROM b GROUP BY 1),
      cum AS (SELECT cents, SUM(na) OVER (ORDER BY cents) AS ca,
                     SUM(nb) OVER (ORDER BY cents) AS cb FROM per),
      tot AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM per)
      SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
        CAST(MAX(ABS(ca*tb - cb*ta)) AS BIGINT) AS ks_num,
        CAST(MAX(ABS(ca*tb - cb*ta)) AS DOUBLE)
          / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)) AS ks
      FROM cum, tot GROUP BY ta, tb""")),

    // ---- Mann-Whitney U drift (rank companion to w31's KS): does the
    // after-cut value distribution stochastically dominate? Exact
    // midrank rank-sum (shared aucFromScored core, t30 contract);
    // oracle applies the textbook single-task midrank window the
    // engine replaces with PrefixSum ---------------------------------
    ("w37_mann_whitney", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.mannWhitneyDrift(t(s, d, "events"),
        "TIMESTAMP '2024-01-16 00:00:00'"),
      Some("""
      WITH b AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS score,
                 ts >= TIMESTAMP '2024-01-16 00:00:00' AS pos FROM events),
      grp AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS np
              FROM b GROUP BY score),
      o AS (SELECT score, n, np,
                   COALESCE(SUM(n) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS c_before
            FROM grp),
      agt AS (SELECT SUM(CAST(np AS HUGEINT) * (2 * c_before + n + 1))
                       AS s2,
                     CAST(SUM(np) AS HUGEINT) AS npos,
                     CAST(SUM(n - np) AS HUGEINT) AS nneg,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct_scores
              FROM o)
      SELECT CAST(npos AS BIGINT) AS n_after,
             CAST(nneg AS BIGINT) AS n_before,
             n_distinct_scores,
             CAST(s2 - npos * (npos + 1) AS BIGINT) AS u2_after,
             CAST(2 * npos * nneg AS BIGINT) AS u2_den,
             CAST((s2 - npos * (npos + 1)) * 1000000
               // (2 * npos * nneg) AS BIGINT) AS superiority_ppm
      FROM agt""")),

    // ---- Pettitt changepoint (1979): WHERE the value distribution
    // shifted — w37's location companion. The O(n²) sgn double sum
    // collapses through the exact midrank identity U_t = Σ_{i≤t}2R_i
    // − t(n+1) into two balanced prefix passes; oracle applies the
    // identical identity via the textbook single-task windows --------
    ("w38_pettitt", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.pettittChangepoint(t(s, d, "events")),
      Some("""
      WITH b AS (SELECT event_id, epoch_us(ts) AS tus,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
      r AS (SELECT event_id, tus,
              2 * RANK() OVER (ORDER BY cents)
                + COUNT(*) OVER (PARTITION BY cents) - 1 AS r2
            FROM b),
      u AS (SELECT tus, event_id,
              CAST(SUM(r2) OVER (ORDER BY tus, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                - ROW_NUMBER() OVER (ORDER BY tus, event_id)
                  * (nn.n + 1) AS ut
            FROM r, nn),
      k AS (SELECT CAST(MAX(ABS(ut)) AS BIGINT) AS k_stat FROM u),
      cp AS (SELECT tus, ut FROM u, k WHERE ABS(ut) = k.k_stat
             ORDER BY tus, event_id LIMIT 1)
      SELECT nn.n, k.k_stat, cp.tus AS cp_ts_us,
             CAST(cp.ut AS BIGINT) AS u_at_cp
      FROM nn, k, cp""")),

    // ---- binary-segmentation changepoints: the global Pettitt cp
    // splits the series and the SAME exact midrank statistic re-runs
    // INSIDE each side (per-segment midranks — a segment's U sees its
    // own distribution); oracle repeats the w38 single-task window
    // block per segment with the split as scalar subqueries ----------
    ("w42_pettitt_segments", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.pettittSegments(t(s, d, "events")),
      Some {
      def pett(p: String, src: String) = s"""
        nn$p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM $src),
        r$p AS (SELECT event_id, tus,
                  2 * RANK() OVER (ORDER BY cents)
                    + COUNT(*) OVER (PARTITION BY cents) - 1 AS r2
                FROM $src),
        u$p AS (SELECT tus, event_id,
                  CAST(SUM(r2) OVER (ORDER BY tus, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    - ROW_NUMBER() OVER (ORDER BY tus, event_id)
                      * (nn$p.n + 1) AS ut
                FROM r$p, nn$p),
        k$p AS (SELECT CAST(MAX(ABS(ut)) AS BIGINT) AS k_stat FROM u$p),
        cp$p AS (SELECT tus, event_id, ut FROM u$p, k$p
                 WHERE ABS(ut) = k$p.k_stat
                 ORDER BY tus, event_id LIMIT 1)"""
      def out(name: String, p: String) =
        s"""SELECT '$name' AS segment, nn$p.n, k$p.k_stat,
              cp$p.tus AS cp_ts_us, CAST(cp$p.ut AS BIGINT) AS u_at_cp
            FROM nn$p, k$p, cp$p"""
      s"""
      WITH b AS (SELECT event_id, epoch_us(ts) AS tus,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events),
      ${pett("0", "b")},
      bl AS (SELECT event_id, tus, cents FROM b
             WHERE tus < (SELECT tus FROM cp0)
                OR (tus = (SELECT tus FROM cp0)
                    AND event_id <= (SELECT event_id FROM cp0))),
      br AS (SELECT event_id, tus, cents FROM b
             WHERE tus > (SELECT tus FROM cp0)
                OR (tus = (SELECT tus FROM cp0)
                    AND event_id > (SELECT event_id FROM cp0))),
      ${pett("1", "bl")},
      ${pett("2", "br")}
      SELECT * FROM (
        ${out("all", "0")}
        UNION ALL ${out("left", "1")}
        UNION ALL ${out("right", "2")}) z
      ORDER BY segment"""
      }),

    // ---- burst intervals: maximal runs of hours above 5/4 x the
    // trailing 24h average (full windows only), cross-multiplied
    // integer threshold, gaps-and-islands over the flagged tail via
    // SeqNumber; oracle applies the textbook single-task windows -----
    ("w40_bursts", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.bursts(t(s, d, "events"), num = 5, den = 4),
      Some("""
      WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS h,
              CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
      tr AS (SELECT h + o AS h2, c FROM hourly,
               (SELECT unnest(generate_series(1, 24)) AS o) os),
      ag AS (SELECT h2, CAST(SUM(c) AS BIGINT) AS s24,
               CAST(COUNT(*) AS BIGINT) AS n24 FROM tr GROUP BY 1),
      fl AS (SELECT h, c, s24 FROM hourly JOIN ag ON ag.h2 = hourly.h
             WHERE n24 = 24 AND c * 96 > s24 * 5),
      sq AS (SELECT h, c, s24, h - ROW_NUMBER() OVER (ORDER BY h) AS g
             FROM fl)
      SELECT CAST(MIN(h) AS BIGINT) AS start_h,
             CAST(MAX(h) AS BIGINT) AS end_h,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(MAX(c) AS BIGINT) AS peak_count,
             CAST(SUM(c * 96 - s24 * 5) AS BIGINT) AS excess_num
      FROM sq GROUP BY g ORDER BY start_h""")),

    // ---- exact Spearman rank correlation between the hourly count
    // and hourly value series: Pearson over doubled integer midranks
    // (the t30/w37/w38 discipline), moments in BIGINT, one IEEE
    // num/(sqrt*sqrt) at the read edge; oracle applies the textbook
    // single-task midrank windows the engine replaces with PrefixSum
    ("w39_spearman", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.spearmanHourly(t(s, d, "events")),
      Some("""
      WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS h,
              CAST(COUNT(*) AS BIGINT) AS x,
              CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS y
            FROM events GROUP BY 1),
      r AS (SELECT 2 * RANK() OVER (ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY x) - 1 AS rx2,
                   2 * RANK() OVER (ORDER BY y)
                     + COUNT(*) OVER (PARTITION BY y) - 1 AS ry2
            FROM hourly),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(rx2) AS BIGINT) AS sx,
              CAST(SUM(ry2) AS BIGINT) AS sy,
              CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
              CAST(SUM(ry2 * ry2) AS BIGINT) AS syy,
              CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy
            FROM r)
      SELECT n AS n_hours,
             CAST(n * sxy - sx * sy AS BIGINT) AS num,
             CAST(n * sxx - sx * sx AS BIGINT) AS d1,
             CAST(n * syy - sy * sy AS BIGINT) AS d2,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                       * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS rho
      FROM m""")),

    // ---- Holt linear-trend smoother: level + trend recursion as ONE
    // hash aggregation (w23's fold contract) in exact BIGINT cents<<20
    // with dyadic alpha=1/4, beta=1/2 — every step an arithmetic right
    // shift (floor, even for negative trends; div/// would truncate).
    // Oracle = the identical integer recurrence as a recursive CTE,
    // never list_reduce (struct-accumulator miscompute in DuckDB 1.0)
    ("w32_holt", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.holt(t(s, d, "events")),
      Some("""
      WITH RECURSIVE c AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
        FROM events),
      nn AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
             FROM c GROUP BY user_id),
      r(user_id, rn, l, b) AS (
        SELECT user_id, rn, cents * 1048576, CAST(0 AS BIGINT)
        FROM c WHERE rn = 1
        UNION ALL
        SELECT c.user_id, c.rn,
               ((c.cents * 1048576 + 3 * (r.l + r.b)) >> 2),
               ((((c.cents * 1048576 + 3 * (r.l + r.b)) >> 2)
                 - r.l + r.b) >> 1)
        FROM r JOIN c ON c.user_id = r.user_id AND c.rn = r.rn + 1)
      SELECT r.user_id, nn.n,
             CAST(r.l AS DOUBLE) / 104857600.0 AS level,
             CAST(r.b AS DOUBLE) / 104857600.0 AS trend,
             CAST(r.l + 4 * r.b AS DOUBLE) / 104857600.0 AS forecast4
      FROM r JOIN nn ON nn.user_id = r.user_id AND r.rn = nn.n
      ORDER BY r.user_id""")),

    // ---- additive seasonal decomposition of the hourly load series:
    // centered 25h moving-average trend (daily cycle averages out),
    // hour-of-day seasonal of the CROSS-MULTIPLIED detrended values
    // (total·25 − sum25, exact BIGINT), residual at the read edge;
    // moving window = offset explode + groupBy on the hour key, never
    // an unpartitioned window --------------------------------------
    ("w35_seasonal_decompose", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.seasonalDecompose(t(s, d, "events")),
      Some("""
      WITH hourly AS (SELECT epoch_us(ts) // 3600000000 AS h,
              CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS total
            FROM events GROUP BY 1),
      sm AS (SELECT h + o AS c, total
             FROM hourly, (SELECT unnest(generate_series(-12, 12)) AS o) os),
      ag AS (SELECT c, CAST(SUM(total) AS BIGINT) AS sum25,
               CAST(COUNT(*) AS BIGINT) AS n25
             FROM sm GROUP BY 1),
      base AS (SELECT h, total, sum25
               FROM hourly JOIN ag ON ag.c = hourly.h WHERE n25 = 25),
      hod AS (SELECT h % 24 AS hod,
                CAST(SUM(total * 25 - sum25) AS BIGINT) AS s_num,
                CAST(COUNT(*) AS BIGINT) AS s_cnt
              FROM base GROUP BY 1)
      SELECT b.h, b.total AS total_cents,
             CAST(b.sum25 AS DOUBLE) / 25.0 AS trend,
             CAST(s_num AS DOUBLE) / CAST(s_cnt * 25 AS DOUBLE) AS seasonal,
             CAST(b.total * 25 - b.sum25 AS DOUBLE) / 25.0
               - CAST(s_num AS DOUBLE) / CAST(s_cnt * 25 AS DOUBLE) AS resid
      FROM base b JOIN hod ON hod.hod = b.h % 24
      ORDER BY b.h""")),

    // ---- matrix-profile-lite motif discovery: per user the minimal-
    // SAD non-overlapping window pair in exact integer cents (the
    // repeated-cadence detector); windows from ONE partitioned window
    // pass, pairs from the theilSen per-key self-join contract,
    // argmin = lexicographic (sad, i, j) struct-min ------------------
    ("w33_motif", (s: SparkSession, d: String) =>
      graft.ext.TimeSeries.motif(t(s, d, "events"), m = 4),
      Some("""
      WITH c AS (SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS rn
             FROM events),
      w AS (SELECT a.user_id, CAST(a.rn AS BIGINT) AS i,
              list(b.cents ORDER BY b.rn) AS arr
            FROM c a JOIN c b ON b.user_id = a.user_id
              AND b.rn BETWEEN a.rn AND a.rn + 3
            GROUP BY a.user_id, a.rn HAVING COUNT(*) = 4),
      p AS (SELECT x.user_id, x.i, y.i AS j,
              ABS(x.arr[1]-y.arr[1]) + ABS(x.arr[2]-y.arr[2])
              + ABS(x.arr[3]-y.arr[3]) + ABS(x.arr[4]-y.arr[4]) AS sad
            FROM w x JOIN w y ON y.user_id = x.user_id
              AND y.i >= x.i + 4)
      SELECT user_id, n_pairs, i, j, sad AS sad_cents FROM (
        SELECT user_id, i, j, sad,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY sad, i, j) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                 AS n_pairs
        FROM p) q WHERE rk = 1 ORDER BY user_id""")))

  def queries: Map[String, QFn] = defs.map(q => q._1 -> q._2).toMap
  def oracles: Map[String, String] =
    defs.collect { case (n, _, Some(o)) => n -> o.stripMargin.trim }.toMap
}
