package graft.analyze
import graft.core.PlanCapture.CheckpointOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Curation, Dedup, Multimodal, Reconcile, Similarity, TextAnalysis, TextOps, TimeSeries, Validate}
import graft.operators.Layout
import graft.functions.Hashing
import graft.functions.Hashing.{MersennePrime => P}

/** Training-data-pipeline operators (dedup / similarity / multimodal /
  * text analysis) plus the streaming-window workload in its batch form,
  * each paired with a DuckDB oracle.
  *
  * The oracles for minhash/simhash are generated from the same constants
  * the Spark operators use ([[Hashing.perms]]), so signature values are
  * compared number-for-number, not just "produces some pairs".
  */
object ExtQueries {

  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  // ---- generated SQL fragments -----------------------------------------

  private val shinglesSql = TextOps.wordShinglesSql("text", Dedup.ShingleSize)
  private val h32s = Hashing.h32Sql("s")

  private val sigColsSql = Hashing.perms.zipWithIndex
    .map { case ((a, b), j) => s"MIN(($a * h + $b) % $P) AS m$j" }
    .mkString(", ")

  private def bandSelectsSqlShaped(sig: String, bands: Int,
                                   rows: Int) = (0 until bands).map { bi =>
    val ms = (0 until rows).map(ri => s"m${bi * rows + ri}").mkString(", ")
    s"SELECT doc_id, $bi AS band_idx, concat_ws(',', $ms) AS band_key FROM $sig"
  }.mkString(" UNION ALL ")

  private def bandSelectsSql(sig: String) =
    bandSelectsSqlShaped(sig, Dedup.Bands, Dedup.Rows)

  /** Shared CTE chain producing minhash candidate pairs with counts
    * (reused by the dup-pairs oracle and the clustering oracle).
    * `src` is the docs relation (doc_id, text); `cap` — when set —
    * models [[graft.ext.HotBuckets.prune]] exactly: members of band
    * buckets holding more than `cap` docs are removed from candidate
    * generation BEFORE the self-join (a per-bucket HAVING), which is
    * the production shape the default-capped operators run.
    */
  private def minhashCtesFor(src: String, cap: Option[Int] = None): String = {
    val bandCtes = cap match {
      case None => s"bands AS (${bandSelectsSql("sig")})"
      case Some(c) =>
        s"""bands0 AS (${bandSelectsSql("sig")}),
    okb AS (SELECT band_idx, band_key FROM bands0
            GROUP BY band_idx, band_key HAVING COUNT(*) <= $c),
    bands AS (SELECT bands0.* FROM bands0 JOIN okb USING (band_idx, band_key))"""
    }
    s"""sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM $src),
    h AS (SELECT doc_id, $h32s AS h FROM sh),
    sig AS (SELECT doc_id, $sigColsSql FROM h GROUP BY doc_id),
    $bandCtes,
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM bands x JOIN bands y
             ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
    arr AS (SELECT doc_id, $shinglesSql AS sa FROM $src),
    com AS (SELECT doc_a, doc_b,
                   CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                   CAST(len(a.sa) AS INT) AS na, CAST(len(b.sa) AS INT) AS nb
            FROM cand JOIN arr a ON a.doc_id = doc_a JOIN arr b ON b.doc_id = doc_b)"""
  }

  private val minhashCtes: String = minhashCtesFor("documents")

  private val minhashOracle: String = s"""
    WITH $minhashCtes
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM com
    WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
    ORDER BY doc_a, doc_b"""

  /** Transitive closure over the dup pairs via recursive CTE; min
    * reachable id = cluster representative (matches the Spark side's
    * iterative min-label propagation exactly — both are fixpoints of
    * the same monotone function).
    */
  private val clustersOracle: String = s"""
    WITH RECURSIVE $minhashCtes,
    dup AS (SELECT doc_a, doc_b FROM com
            WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup
              UNION SELECT doc_b, doc_a FROM dup),
    reach(src, dst) AS (
      (SELECT src, dst FROM edges UNION SELECT src, src FROM edges)
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS doc_id, MIN(dst) AS rep_id
    FROM reach GROUP BY src ORDER BY doc_id"""

  /** d22 twin of [[graft.ext.Dedup.nearDupResolution]]: the d09
    * transitive closure plus the t02 quality chain; the per-cluster
    * winner is ROW_NUMBER over (quality DESC, doc_id) — identical to
    * the Spark side's max_by over (quality, -doc_id).
    */
  private val nearDupResolutionOracle: String = s"""
    WITH RECURSIVE $minhashCtes,
    dup AS (SELECT doc_a, doc_b FROM com
            WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup
              UNION SELECT doc_b, doc_a FROM dup),
    reach(src, dst) AS (
      (SELECT src, dst FROM edges UNION SELECT src, src FROM edges)
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cl AS (SELECT src AS doc_id, MIN(dst) AS rep_id FROM reach GROUP BY src),
    $qualityCtes,
    jj AS (SELECT cl.doc_id, cl.rep_id, qual.quality
           FROM cl JOIN qual USING (doc_id)),
    w AS (SELECT rep_id, doc_id AS keep_id FROM (
           SELECT rep_id, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY rep_id
                    ORDER BY quality DESC, doc_id) AS rn FROM jj) WHERE rn = 1)
    SELECT jj.doc_id, jj.rep_id, jj.quality, jj.doc_id = w.keep_id AS keep
    FROM jj JOIN w USING (rep_id) ORDER BY doc_id"""

  /** `preCtes`, when non-empty, is spliced verbatim after WITH (must end
    * with a comma) — lets a caller prepend a fixture relation CTE. */
  private def simhashExprFor(src: String, preCtes: String = ""): String = {
    // 64-bit fingerprint: bits 0-31 tally h32(word) bits, 32-63 tally
    // h32b(word) bits — mirrors Dedup.simhashViaAgg term for term. The
    // j=63 term is the sign bit (literal parses via HUGEINT, cast back);
    // added last so the partial BIGINT sums (<= 2^63-1) never overflow.
    val bitSums = (0 until Dedup.SimhashBits).map { j =>
      val (h, b) = if (j < 32) ("hlo", j) else ("hhi", j - 32)
      s"SUM(CASE WHEN ($h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val value = (0 until Dedup.SimhashBits)
      .map(j => s"CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""
    WITH $preCtes w AS (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS wd FROM $src),
    h AS (SELECT doc_id, ${Hashing.h32Sql("wd")} AS hlo, ${Hashing.h32bSql("wd")} AS hhi FROM w),
    sums AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
    sh AS (SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM sums)"""
  }

  private val simhashExpr: String = simhashExprFor("documents")

  private val simhashOracle: String =
    s"$simhashExpr SELECT doc_id, simhash FROM sh ORDER BY doc_id"

  private def simhashDupOracleFor(src: String, cap: Option[Int] = None,
                                  preCtes: String = ""): String = {
    val bands = (0 until Dedup.SimhashBands)
      .map(k => s"SELECT doc_id, simhash, $k AS band_idx, " +
        s"(simhash >> ${Dedup.SimhashBandBits * k}) & ${Dedup.SimhashBandMask} AS band_val FROM sh")
      .mkString(" UNION ALL ")
    val bandedCtes = cap match {
      case None => s"banded AS ($bands)"
      case Some(c) =>
        s"""banded0 AS ($bands),
    okb AS (SELECT band_idx, band_val FROM banded0
            GROUP BY band_idx, band_val HAVING COUNT(*) <= $c),
    banded AS (SELECT banded0.* FROM banded0 JOIN okb USING (band_idx, band_val))"""
    }
    s"""${simhashExprFor(src, preCtes)},
    $bandedCtes,
    pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                     x.simhash AS sha, y.simhash AS shb
              FROM banded x JOIN banded y
              ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
    FROM pairs WHERE bit_count(xor(sha, shb)) <= 6
    ORDER BY doc_a, doc_b"""
  }

  private val simhashDupOracle: String = simhashDupOracleFor("documents")

  /** Incremental dedup oracle: new (odd doc_id) vs corpus (even doc_id)
    * band join — no self-pairs on either side by construction. */
  private val incrementalDupOracle: String = s"""
    WITH csh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents WHERE doc_id % 2 = 0),
    nsh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents WHERE doc_id % 2 = 1),
    ch AS (SELECT doc_id, $h32s AS h FROM csh),
    nh AS (SELECT doc_id, $h32s AS h FROM nsh),
    csig AS (SELECT doc_id, $sigColsSql FROM ch GROUP BY doc_id),
    nsig AS (SELECT doc_id, $sigColsSql FROM nh GROUP BY doc_id),
    cbands AS (${bandSelectsSql("csig")}),
    nbands AS (${bandSelectsSql("nsig")}),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM nbands x JOIN cbands y
             ON x.band_idx = y.band_idx AND x.band_key = y.band_key),
    arr AS (SELECT doc_id, $shinglesSql AS sa FROM documents),
    com AS (SELECT doc_a, doc_b,
                   CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                   CAST(len(a.sa) AS INT) AS na, CAST(len(b.sa) AS INT) AS nb
            FROM cand JOIN arr a ON a.doc_id = doc_a JOIN arr b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM com
    WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
    ORDER BY doc_a, doc_b"""

  /** Bloom membership oracle: same positions (shared perms mod P mod
    * m), 63-bit words, bit_or build, left-join probe. */
  private val bloomOracle: String = {
    val m = 65536L
    val k = 4
    val hs = Hashing.h32Sql("text")
    def posSelects(src: String, cols: String) =
      Hashing.perms.take(k).map { case (a, b) =>
        s"SELECT $cols, (($a * h + $b) % $P) % $m AS p FROM $src"
      }.mkString(" UNION ALL ")
    s"""
    WITH ch AS (SELECT DISTINCT $hs AS h FROM documents WHERE doc_id < 400),
    cpos AS (${posSelects("ch", "h")}),
    filt AS (SELECT p // 63 AS word_idx,
                    bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS word
             FROM cpos GROUP BY p // 63),
    ph AS (SELECT doc_id, $hs AS h FROM documents),
    ppos AS (${posSelects("ph", "doc_id, h")}),
    hits AS (SELECT doc_id, h,
                    (f.word IS NOT NULL AND (f.word >> CAST(p % 63 AS INT)) & 1 = 1) AS hit
             FROM ppos LEFT JOIN filt f ON f.word_idx = p // 63),
    verdict AS (SELECT doc_id, h, bool_and(hit) AS maybe_in_corpus
                FROM hits GROUP BY doc_id, h)
    SELECT doc_id, maybe_in_corpus,
           (h IN (SELECT h FROM ch)) AS actually_in_corpus
    FROM verdict ORDER BY doc_id"""
  }

  private val repetitionOracle: String = """
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
    ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
                  CAST(MAX(c) AS BIGINT) AS top_word_n
           FROM wc GROUP BY doc_id),
    sh AS (SELECT doc_id,
                  CAST(GREATEST(len(string_split(text, ' ')) - 2, 0) AS INT) AS n_3g,
                  CAST(len(__SHINGLES3__) AS INT) AS n_distinct_3g
           FROM documents)
    SELECT ws.doc_id, n_words, n_distinct_words, top_word_n, n_3g, n_distinct_3g,
           1.0 - CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
           CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
           CASE WHEN n_3g > 0
                THEN 1.0 - CAST(n_distinct_3g AS DOUBLE) / CAST(n_3g AS DOUBLE)
                ELSE 0.0 END AS dup_3gram_frac,
           (1.0 - CAST(n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE)) <= 0.6
             AND (CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE)) <= 0.3
             AND (CASE WHEN n_3g > 0
                  THEN 1.0 - CAST(n_distinct_3g AS DOUBLE) / CAST(n_3g AS DOUBLE)
                  ELSE 0.0 END) <= 0.6 AS keep
    FROM ws JOIN sh ON ws.doc_id = sh.doc_id
    ORDER BY ws.doc_id"""
    .replace("__SHINGLES3__", TextOps.wordShinglesSql("text", 3))

  private val hashSplitOracle: String = s"""
    SELECT doc_id,
           ${Hashing.h32Sql("text")} % 100 AS bucket,
           CASE WHEN ${Hashing.h32Sql("text")} % 100 < 80 THEN 'train'
                WHEN ${Hashing.h32Sql("text")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents ORDER BY doc_id"""

  private val ngramsSql = TextOps.charNgramsSql("text", 4)

  private val ngramJaccardOracle: String = s"""
    WITH g AS (SELECT doc_id, lang, n_chars, $ngramsSql AS grams FROM documents),
    com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS INT) AS n_common,
                   CAST(len(a.grams) AS INT) AS na, CAST(len(b.grams) AS INT) AS nb
            FROM g a JOIN g b
            ON a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 10 AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, n_common,
           CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
    FROM com
    WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
    ORDER BY doc_a, doc_b"""

  private def dotS(a: String, b: String) = Similarity.dotSql(a, b)
  private def normS(a: String) = Similarity.normSql(a)

  /** The reconciliation fixture's divergent replica: drop every 997th
    * doc, append " v2" to every 499th's text — deletions AND
    * modifications, derived in-query so both engines build the same
    * replica.
    */
  private val ReconcileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def reconcileV2(a: DataFrame): DataFrame =
    a.filter(col("doc_id") % 997 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 499 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))

  private val reconcileBucketSql: String =
    s"${Hashing.h32Sql("CAST(doc_id AS VARCHAR)")} % 64"

  private val reconcileCtes: String = {
    val rh = Reconcile.rowHashSql(ReconcileCols)
    s"""b2 AS (SELECT doc_id,
               CASE WHEN doc_id % 499 = 0 THEN text || ' v2' ELSE text END AS text,
               lang, source, n_chars FROM documents WHERE doc_id % 997 <> 0),
      da AS (SELECT $reconcileBucketSql AS bucket, CAST(COUNT(*) AS BIGINT) AS n_a,
                    CAST(SUM($rh) AS BIGINT) AS digest_a
             FROM documents GROUP BY 1),
      db AS (SELECT $reconcileBucketSql AS bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
                    CAST(SUM($rh) AS BIGINT) AS digest_b
             FROM b2 GROUP BY 1)"""
  }

  /** Analytic twin of [[Multimodal.syntheticPatternImages]] +
    * [[Multimodal.dhash64]]: per-doc dHash recomputed from the md5 cell
    * rule — pattern p = doc_id%16, cell v = h32(p*72 + qy*9 + qx) % 256
    * (first three cells of row p%8 complemented for noisy docs), bit
    * qy*8+qx set when the right neighbor cell is greater. Bit 63 is
    * spelled as the Long sign-bit literal: DuckDB refuses 1<<63 where
    * Spark's shiftleft wraps — same value, written out.
    */
  /** cells + hh CTEs computing the analytic 9x8-grid dHash per
    * (pattern, noisy) variant; expects a `pn(p, noisy)` CTE upstream.
    * Shared by the image (m05) and video (m08) oracles.
    */
  private val patternCellsHhCtes: String = {
    val cellHash = Hashing.h32Sql(
      "CAST(pn.p*72 + gy.qy*9 + gx.qx AS VARCHAR)") + " % 256"
    s"""cells AS (SELECT pn.p, pn.noisy, gx.qx, gy.qy,
          CASE WHEN pn.noisy AND gy.qy = pn.p % 8 AND gx.qx <= 2
               THEN 255 - ($cellHash) ELSE ($cellHash) END AS v
        FROM pn CROSS JOIN range(9) gx(qx) CROSS JOIN range(8) gy(qy)),
      hh AS (SELECT c1.p, c1.noisy,
          CAST(SUM(CASE WHEN c2.v <= c1.v THEN CAST(0 AS BIGINT)
               WHEN c1.qy*8 + c1.qx = 63 THEN CAST(-9223372036854775808 AS BIGINT)
               ELSE (CAST(1 AS BIGINT) << CAST(c1.qy*8 + c1.qx AS INT)) END)
            AS BIGINT) AS dhash
        FROM cells c1 JOIN cells c2 ON c1.p = c2.p AND c1.noisy = c2.noisy
         AND c1.qy = c2.qy AND c2.qx = c1.qx + 1
        WHERE c1.qx < 8 GROUP BY c1.p, c1.noisy)"""
  }

  private val phashDocsCte: String = {
    s"""d AS (SELECT doc_id, CAST(doc_id % ${Multimodal.PatternCount} AS BIGINT) AS p,
             9*(2 + doc_id % 3) AS w, 8*(2 + doc_id % 2) AS h,
             (doc_id % ${Multimodal.NoiseEvery} = 0) AS noisy FROM documents),
      pn AS (SELECT DISTINCT p, noisy FROM d),
      $patternCellsHhCtes,
      hd AS (SELECT d.doc_id, d.w, d.h, hh.dhash FROM d
             JOIN hh ON d.p = hh.p AND d.noisy = hh.noisy)"""
  }

  private val cosineDupOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
    ORDER BY vec_a, vec_b"""

  private val lshCosineDupOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
    pl0 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8),
    pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
           FROM pl0),
    b AS (SELECT v.vec_id,
                 CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                          THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
          FROM embeddings v CROSS JOIN pl p GROUP BY v.vec_id),
    eb AS (SELECT e.vec_id, embedding, nrm, bucket FROM e JOIN b ON e.vec_id = b.vec_id)
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket AS bucket,
           ${dotS("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
    FROM eb x JOIN eb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE ${dotS("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= 0.4
    ORDER BY vec_a, vec_b"""

  // banded LSH: planes 0..7 split into 2 bands of 4; candidates collide
  // in at least one band (DISTINCT pairs), then exact-cosine verified
  private val bandedCosineDupOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
    pl0 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8),
    pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
           FROM pl0),
    bb AS (SELECT v.vec_id, CAST(p.j // 4 AS INT) AS band,
                  CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                           THEN (CAST(1 AS BIGINT) << CAST(p.j % 4 AS INT)) ELSE 0 END) AS BIGINT) AS bucket
           FROM embeddings v CROSS JOIN pl p
           GROUP BY v.vec_id, CAST(p.j // 4 AS INT)),
    cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
             FROM bb x JOIN bb y
             ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
    SELECT c.a_id AS vec_a, c.b_id AS vec_b,
           ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
    FROM cand c JOIN e a ON c.a_id = a.vec_id JOIN e b ON c.b_id = b.vec_id
    WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.4
    ORDER BY vec_a, vec_b"""

  private val annTopkOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
    sc AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                  ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
           FROM e q JOIN e t ON q.vec_id < 10 AND t.vec_id >= 10)
    SELECT qid AS query_id, tid AS neighbor_id, cosine, rn
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, tid) AS INT) AS rn FROM sc) z
    WHERE rn <= 5 ORDER BY query_id, rn"""

  private val annLshOracle: String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
    pl0 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8),
    pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
           FROM pl0),
    b AS (SELECT v.vec_id,
                 CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                          THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
          FROM embeddings v CROSS JOIN pl p GROUP BY v.vec_id),
    q AS (SELECT e.vec_id AS q_id, embedding AS q_emb, nrm AS q_norm, bucket
          FROM e JOIN b ON e.vec_id = b.vec_id WHERE e.vec_id < 10),
    tt AS (SELECT e.vec_id AS t_id, embedding AS t_emb, nrm AS t_norm, bucket AS t_bucket
           FROM e JOIN b ON e.vec_id = b.vec_id WHERE e.vec_id >= 10),
    sc AS (SELECT q_id, t_id, bucket,
                  ${dotS("q_emb", "t_emb")} / (q_norm * t_norm) AS cosine
           FROM q JOIN tt ON bucket = t_bucket)
    SELECT q_id AS query_id, t_id AS neighbor_id, bucket, cosine, rn
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, t_id) AS INT) AS rn FROM sc) z
    WHERE rn <= 3 ORDER BY query_id, rn"""

  // IVF: centroids = the 16 lowest-id target vectors (order statistic,
  // arbitrary id spaces); targets assigned to their
  // single nearest centroid, queries probe their 2 nearest cells.
  // DuckDB expresses the assignment as ROW_NUMBER()=1, which equals the
  // Spark side's max_by under the same unique (cosine DESC, c_id) order.
  private def annIvfOracleN(nProbe: Int): String = s"""
    WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
    c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_norm
          FROM e WHERE vec_id >= 10 ORDER BY vec_id LIMIT 16),
    t AS (SELECT vec_id AS t_id, embedding AS t_emb, nrm AS t_norm FROM e WHERE vec_id >= 10),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_norm FROM e WHERE vec_id < 10),
    ta AS (SELECT t_id, t_emb, t_norm, c_id AS cell FROM (
             SELECT t_id, t_emb, t_norm, c_id,
                    ROW_NUMBER() OVER (PARTITION BY t_id
                      ORDER BY ${dotS("t_emb", "c_emb")} / (t_norm * c_norm) DESC, c_id) AS crn
             FROM t CROSS JOIN c) z WHERE crn = 1),
    qp AS (SELECT q_id, q_emb, q_norm, c_id AS cell FROM (
             SELECT q_id, q_emb, q_norm, c_id,
                    ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY ${dotS("q_emb", "c_emb")} / (q_norm * c_norm) DESC, c_id) AS crn
             FROM q CROSS JOIN c) z WHERE crn <= $nProbe),
    sc AS (SELECT q_id, t_id, cell,
                  ${dotS("q_emb", "t_emb")} / (q_norm * t_norm) AS cosine
           FROM qp JOIN ta USING (cell))
    SELECT q_id AS query_id, t_id AS neighbor_id, cell, cosine, rn
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, t_id) AS INT) AS rn FROM sc) z
    WHERE rn <= 5 ORDER BY query_id, rn"""

  private val annIvfOracle: String = annIvfOracleN(2)

  // Count-Min sketch: 4 hash rows from the first 4 minhash perms over
  // h32, width 512; estimates for the exact top-10 words. Deterministic
  // hashing -> the estimates compare value-for-value.
  private val countMinOracle: String = {
    val W = 512
    val ws = TextOps.wordsSql("text")
    val h = Hashing.h32Sql("w")
    def bucketRows(src: String): String = Hashing.perms.take(4).zipWithIndex
      .map { case ((a, b), j) =>
        s"SELECT $src.*, $j AS row_idx, (($a * h + $b) % $P) % $W AS bucket FROM $src"
      }.mkString(" UNION ALL ")
    s"""
    WITH wt AS (SELECT unnest($ws) AS w FROM documents),
    ht AS (SELECT w, $h AS h FROM wt),
    bk AS (${bucketRows("ht")}),
    sk AS (SELECT row_idx, bucket, CAST(COUNT(*) AS BIGINT) AS bucket_n
           FROM bk GROUP BY row_idx, bucket),
    top AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM wt GROUP BY w ORDER BY n_exact DESC, w LIMIT 10),
    th AS (SELECT w, n_exact, $h AS h FROM top),
    tb AS (${bucketRows("th")})
    SELECT w, n_exact, CAST(MIN(bucket_n) AS BIGINT) AS n_est
    FROM tb JOIN sk USING (row_idx, bucket)
    GROUP BY w, n_exact
    ORDER BY n_exact DESC, w"""
  }

  private val langidScoreCols = TextAnalysis.stopwords.map { case (l, ws) =>
    val inList = ws.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(${TextOps.wordsSql("text")}, w -> w IN ($inList))) AS INT) AS n_$l"
  }.mkString(", ")

  private val langidCase: String = {
    val langs = TextAnalysis.stopwords.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val conds = langs.drop(i + 1).map(m => s"n_$l >= n_$m").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE '${langs.last}' END"
  }

  private val langidOracle: String = s"""
    WITH s AS (SELECT doc_id, lang AS labeled_lang, $langidScoreCols FROM documents)
    SELECT *, $langidCase AS predicted_lang
    FROM s ORDER BY doc_id"""

  /** t01's score columns over a chunk-words list `cw` (t37). */
  private val langidChunkScoreCols = TextAnalysis.stopwords.map { case (l, ws) =>
    val inList = ws.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(cw, w -> w IN ($inList))) AS INT) AS n_$l"
  }.mkString(", ")

  /** Confusion matrix of the heuristic language ID against labels —
    * the evaluation companion of t01. */
  private val langidConfusionOracle: String = s"""
    WITH s AS (SELECT doc_id, lang AS labeled_lang, $langidScoreCols FROM documents),
    p AS (SELECT labeled_lang, $langidCase AS predicted_lang FROM s)
    SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY labeled_lang, predicted_lang
    ORDER BY labeled_lang, predicted_lang"""

  /** Quality-score CTE chain ending in `qual(doc_id, ..., quality)` —
    * shared by the t02 oracle and d22's per-cluster winner rule.
    */
  private def qualityCtes: String = {
    val allStop = TextAnalysis.stopwords.flatMap(_._2).map(w => s"'$w'").mkString(", ")
    val ws = TextOps.wordsSql("text")
    s"""qc AS (SELECT doc_id, n_chars,
        CAST(len($ws) AS INT) AS n_words,
        CAST(len(list_distinct($ws)) AS INT) AS n_distinct,
        CAST(len(list_filter($ws, w -> w IN ($allStop))) AS INT) AS n_stop,
        CAST(length(text) AS INT) AS len FROM documents),
    qr AS (SELECT doc_id, n_chars, n_words, n_distinct, n_stop,
        CAST(len - n_words + 1 AS DOUBLE) / n_words AS avg_word_len,
        CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
        CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio FROM qc),
    qual AS (SELECT *,
        0.4 * distinct_ratio + 0.4 * (1.0 - stopword_ratio)
          + 0.2 * LEAST(avg_word_len / 10.0, 1.0) AS quality FROM qr)"""
  }

  private val qualityOracle: String = s"""
    WITH $qualityCtes
    SELECT * FROM qual ORDER BY doc_id"""

  private val tokensOracle: String = s"""
    SELECT doc_id,
      CAST(len(${TextOps.wordsSql("text")}) AS INT) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
      CAST(length(text) AS INT) AS n_chars_calc,
      CAST(length(text) AS DOUBLE) / len(${TextOps.wordsSql("text")}) AS chars_per_token
    FROM documents ORDER BY doc_id"""

  private val fingerprintOracle: String = s"""
    SELECT doc_id,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(${TextOps.wordsSql("text")}, wd -> ${Hashing.h32Sql("wd")})),
        (acc, x) -> (acc * 31 + x) % $P) AS fingerprint,
      md5(text) AS exact_md5
    FROM documents ORDER BY doc_id"""

  private val multimodalOracle: String = s"""
    SELECT doc_id,
      CAST(strlen(text) AS INT) AS n_bytes,
      'fake/utf8' AS mime,
      md5(text) AS checksum,
      CAST(${Hashing.h32Sql("md5(text)")} % 1920 AS INT) AS decoded_width,
      CAST(${Hashing.h32Sql("reverse(md5(text))")} % 1080 AS INT) AS decoded_height,
      CAST(ceil(CAST(strlen(text) AS DOUBLE) / ${Multimodal.FrameBytes}) AS BIGINT) AS n_frames,
      upper(hex(substr(text, 1, ${Multimodal.FrameBytes}))) AS frame0_hex,
      upper(hex(substr(text, (strlen(text) // 2) + 1, ${Multimodal.FrameBytes}))) AS mid_frame_hex
    FROM documents ORDER BY doc_id"""

  // ---- hot-bucket cap fixture ------------------------------------------
  //
  // d31-d34 gate the PRODUCTION capped candidate path of the dedup
  // families (the default [[Dedup.DefaultMaxBucket]] = 10000 that d04/
  // d05/d11 run with and d19 documents): the fixture plants a
  // 10001-member cluster of identical docs/vectors — one bucket (all
  // its bands/postings) strictly over the cap, which uncapped would
  // mean ~5e7 self-pairs — plus a 2-member "warm" identical pair and a
  // small-doc-in-host containment pair that live in NORMAL buckets.
  // [[graft.ext.HotBuckets.prune]] must drop every hot-cluster member
  // BEFORE the self-join while the warm/nest pairs still come out, so
  // each capped query's rows provably differ from its uncapped twin
  // (d05/d04/d11/d19: no planted pairs there) and the oracle models
  // the cap itself as a per-bucket HAVING COUNT(*) <= cap.
  // Synthetic tokens keep planted shingles/words disjoint from the
  // organic corpus at any sf.

  private val HotText = "hotqz alphqz betaqz gammqz deltqz" // 3 shingles
  private val WarmText = "warmqz epsqz zetaqz etaqz thetqz"
  private val NestSmallText = "nestqz iotaqz kapqz lamqz muqz"
  private val NestHostText = NestSmallText + " nuqz xiqz omiqz"

  private def docsAug(s: SparkSession, d: String): DataFrame = {
    def planted(n: Long, idBase: Long, text: String) =
      s.range(n).select((col("id") + idBase).as("doc_id"),
        lit(text).as("text"))
    t(s, d, "documents").select(col("doc_id"), col("text"))
      .unionByName(planted(10001, 9000000L, HotText))
      .unionByName(planted(2, 9500000L, WarmText))
      .unionByName(planted(1, 9600000L, NestSmallText))
      .unionByName(planted(1, 9600001L, NestHostText))
  }

  private val docsAugSql: String = s"""docs_aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT 9000000 + gx, '$HotText' FROM range(10001) ga(gx)
      UNION ALL SELECT 9500000 + gx, '$WarmText' FROM range(2) gb(gx)
      UNION ALL SELECT 9600000, '$NestSmallText'
      UNION ALL SELECT 9600001, '$NestHostText')"""

  /** Embedding twin of [[docsAug]]: 10001 copies of e0 = (1,0,...,0)
    * collapse into one over-cap LSH bucket; the warm pair -e0 lands in
    * the bitwise-complement bucket (different as long as no plane's
    * first component is exactly 0 — the planes are organic data).
    */
  private def embsAug(s: SparkSession, d: String): DataFrame = {
    val dim = 64
    def basis(sign: Float): Array[Float] =
      Array.tabulate(dim)(i => if (i == 0) sign else 0f)
    def planted(n: Long, idBase: Long, v: Array[Float]) =
      s.range(n).select((col("id") + idBase).as("vec_id"),
        typedLit(v).as("embedding"))
    t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      .unionByName(planted(10001, 9000000L, basis(1f)))
      .unionByName(planted(2, 9500000L, basis(-1f)))
  }

  private val embsAugSql: String = {
    def basisSql(sign: Int) =
      s"list_transform(range(64), i -> CAST(CASE WHEN i = 0 THEN $sign ELSE 0 END AS FLOAT))"
    s"""embs_aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL SELECT 9000000 + gx, ${basisSql(1)} FROM range(10001) ga(gx)
      UNION ALL SELECT 9500000 + gx, ${basisSql(-1)} FROM range(2) gb(gx))"""
  }

  /** c38/c39/c41's shared oracle CTE chain: the doc_id % 7 URL plant
    * plus the full canonicalization pipeline, ending in
    * n5(doc_id, url, norm_url, domain) — the DuckDB twin of
    * `Curation.urlPlant` + `urlNormalize`, kept in ONE place so the
    * oracles can never drift from each other. `from` is any relation
    * exposing a doc_id column (documents for c38/c39, the event log
    * for c41).
    */
  private def urlNormCtesOver(from: String): String = s"""u AS (SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN concat(
               'HTTP://WWW.Example.COM:80/Path/item?utm_source=feed&id=',
               doc_id, '#frag')
             WHEN doc_id % 7 = 1 THEN 'https://news.example.org/a/b'
             WHEN doc_id % 7 = 2 THEN
               'https://user:pw@Shop.Example.co.uk:443//sale/' || doc_id
             WHEN doc_id % 7 = 3 THEN
               'http://blog.example.net:8080/?gclid=g' || doc_id
             WHEN doc_id % 7 = 4 THEN
               'https://XN--Bcher-KVA.ch/B%C3%BCcher?ref=ad&q=' || doc_id
             WHEN doc_id % 7 = 5 THEN 'http://example.com'
             ELSE concat('https://m.example.com/p?fbclid=x&a=', doc_id,
                    '&utm_medium=soc&b=2') END AS url
        FROM $from),
      ${urlNormChainOver("u", "n")}"""

  /** The normalization chain ALONE over any relation exposing
    * (doc_id, url) — the plant-free half of [[urlNormCtesOver]],
    * reusable for URL sets that do not come from the %7 plant (the
    * c44 sitemap locs). Emits CTEs `p1`..`p5` under the given prefix;
    * the last one carries (doc_id, url, path, query_norm, norm_url,
    * domain).
    */
  private def urlNormChainOver(rel: String, p: String): String =
    s"""${p}1 AS (SELECT doc_id, url,
          lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
            AS scheme,
          regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(.*)$$', 1)
            AS rest FROM $rel),
      ${p}2 AS (SELECT *,
          regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
            '([^@]*)$$', 1) AS hostport,
          regexp_extract(rest, '^[^/?#]*([^#]*)', 1) AS pathq FROM ${p}1),
      ${p}3 AS (SELECT *,
          lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
          regexp_extract(hostport, ':([0-9]+)$$', 1) AS port0 FROM ${p}2),
      ${p}4 AS (SELECT *,
          CASE WHEN (scheme = 'http' AND port0 = '80')
                 OR (scheme = 'https' AND port0 = '443')
               THEN '' ELSE port0 END AS port,
          CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
               ELSE regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                 '/+', '/', 'g') END AS path,
          coalesce(array_to_string(list_filter(
            string_split(regexp_extract(pathq, '[?](.*)$$', 1), '&'),
            p -> p <> '' AND NOT regexp_matches(p,
              '^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$$')), '&'), '')
            AS query_norm FROM ${p}3),
      ${p}5 AS (SELECT doc_id, url, path, query_norm,
          scheme || '://' || host ||
            CASE WHEN port = '' THEN '' ELSE ':' || port END || path ||
            CASE WHEN query_norm = '' THEN '' ELSE '?' || query_norm END
            AS norm_url,
          CASE WHEN len(string_split(host, '.')) >= 3
                 AND (string_split(host, '.')[-2] || '.' ||
                      string_split(host, '.')[-1]) IN (${
                       graft.ext.Curation.PslSubset.map(s => s"'$s'")
                         .mkString(", ")})
               THEN string_split(host, '.')[-3] || '.' ||
                    string_split(host, '.')[-2] || '.' ||
                    string_split(host, '.')[-1]
               WHEN len(string_split(host, '.')) >= 2
               THEN string_split(host, '.')[-2] || '.' ||
                    string_split(host, '.')[-1]
               ELSE host END AS domain FROM ${p}4)"""

  private val urlNormCtes: String = urlNormCtesOver("documents")

  /** The per-domain robots plant as a SQL relation — emitted
    * mechanically from the ONE Scala literal
    * (`Curation.DomainRobots`), the PslSubset interpolation
    * discipline: the plant cannot drift between engines because both
    * read the same constant.
    */
  private val domainRobotsValues: String =
    graft.ext.Curation.DomainRobots.map { case (d, txt) =>
      val lines = txt.split("\n", -1).map(l => s"'$l'").mkString(", ")
      s"SELECT '$d' AS domain, concat_ws(chr(10), $lines) AS robots_txt"
    }.mkString("\n        UNION ALL ")

  /** The per-domain sitemap plant as a SQL relation — the
    * [[domainRobotsValues]] discipline applied to
    * `Curation.DomainSitemaps` (XML quotes doubled for SQL literals).
    */
  private val domainSitemapsValues: String =
    graft.ext.Curation.DomainSitemaps.map { case (d, xml) =>
      s"SELECT '$d' AS sm_domain, '${xml.replace("'", "''")}' AS sitemap_xml"
    }.mkString("\n        UNION ALL ")

  /** The sitemap-index plant as a SQL relation — the
    * [[domainSitemapsValues]] discipline applied to
    * `Curation.DomainSitemapIndexes`.
    */
  private val domainSitemapIndexesValues: String =
    graft.ext.Curation.DomainSitemapIndexes.map { case (d, xml) =>
      s"SELECT '$d' AS index_domain, '${xml.replace("'", "''")}' AS index_xml"
    }.mkString("\n        UNION ALL ")

  /** c41/c43's shared robots-parse CTE chain: the per-domain plant,
    * case-preserving `*`-group scoping (directives case-folded, VALUES
    * kept — rule paths are case-sensitive per RFC 9309 §2.2.2), ending
    * in rbp(domain, crawl_delay_s, rules) where rules is a list of
    * {is_allow, rpath} structs — the DuckDB twin of
    * `Curation.domainRobots` + `robotsRules`, in ONE place so the
    * admission and politeness oracles can never drift.
    */
  /** The rules chain for ONE crawler identity: `agent = None` is the
    * generic `*` view; `Some(token)` applies RFC 9309 §2.2.1 group
    * matching (the first group naming the token, falling back to `*`).
    * Emits `<pfx>rbl`..`<pfx>rbp` reading the shared `rb` plant.
    */
  private def robotsRulesChainFor(pfx: String,
                                  agent: Option[String]): String = {
    val named = agent match {
      case Some(a) => s"""coalesce(list_filter(range(1, len(ls) + 1),
                i -> regexp_matches(lower(ls[i]),
                  '^user-agent:[ ]*$a$$'))[1],
              list_filter(range(1, len(ls) + 1),
                i -> regexp_matches(lower(ls[i]),
                  '^user-agent:[ ]*[*]$$'))[1])"""
      case None => s"""list_filter(range(1, len(ls) + 1),
                i -> regexp_matches(lower(ls[i]),
                  '^user-agent:[ ]*[*]$$'))[1]"""
    }
    s"""${pfx}rbl AS (SELECT domain, list_transform(
                string_split(robots_txt, chr(10)), l -> trim(l)) AS ls
              FROM rb),
      ${pfx}rbs AS (SELECT *, $named AS star FROM ${pfx}rbl),
      ${pfx}rbb AS (SELECT *, coalesce(list_filter(range(1, len(ls) + 1),
                i -> i > star AND NOT regexp_matches(lower(ls[i]),
                  '^user-agent:'))[1], len(ls) + 1) AS beg
              FROM ${pfx}rbs),
      ${pfx}rbn AS (SELECT *, list_filter(range(1, len(ls) + 1),
                i -> i >= beg AND regexp_matches(lower(ls[i]),
                  '^user-agent:'))[1] AS nxt FROM ${pfx}rbb),
      ${pfx}rbg AS (SELECT domain,
                CASE WHEN star IS NULL THEN []
                     ELSE ls[beg : coalesce(nxt, len(ls) + 1) - 1]
                END AS grp FROM ${pfx}rbn),
      ${pfx}rbq AS (SELECT domain,
                CAST(regexp_extract(list_filter(grp,
                    l -> regexp_matches(lower(l),
                      '^crawl-delay:[ ]*[0-9]+[ ]*$$'))[1],
                  ':[ ]*([0-9]+)', 1) AS INT) AS crawl_delay_s,
                list_filter(grp, l -> regexp_matches(lower(l),
                  '^request-rate:[ ]*[0-9]+/[0-9]+[ ]*$$'))[1] AS rr,
                list_filter(grp, l -> regexp_matches(lower(l),
                  '^visit-time:[ ]*[0-9]{4}-[0-9]{4}[ ]*$$'))[1] AS vt,
                list_transform(
                  list_filter(grp, l -> regexp_matches(lower(l),
                    '^(dis)?allow:[ ]*/')),
                  l -> {'is_allow': regexp_matches(lower(l), '^allow:'),
                        'rpath': trim(substr(l, strpos(l, ':') + 1))})
                  AS rules
              FROM ${pfx}rbg),
      ${pfx}rbr AS (SELECT domain, crawl_delay_s, rules,
                CAST(regexp_extract(rr, ':[ ]*([0-9]+)/', 1) AS INT)
                  AS rate_num,
                CAST(regexp_extract(rr, '/([0-9]+)', 1) AS INT)
                  AS rate_den_s,
                CAST(regexp_extract(vt, ':[ ]*([0-9]{2})', 1) AS INT) * 60
                  + CAST(regexp_extract(vt, ':[ ]*[0-9]{2}([0-9]{2})', 1)
                      AS INT) AS visit_from_min,
                CAST(regexp_extract(vt, '-([0-9]{2})[0-9]{2}[ ]*$$', 1)
                      AS INT) * 60
                  + CAST(regexp_extract(vt, '-[0-9]{2}([0-9]{2})[ ]*$$', 1)
                      AS INT) AS visit_to_min
              FROM ${pfx}rbq),
      ${pfx}rbt AS (SELECT *,
                CAST((rate_den_s + rate_num - 1) // rate_num AS INT)
                  AS rate_delay_s
              FROM ${pfx}rbr),
      ${pfx}rbp AS (SELECT *,
                CASE WHEN crawl_delay_s IS NULL AND rate_delay_s IS NULL
                     THEN NULL
                     ELSE greatest(coalesce(crawl_delay_s, 0),
                                   coalesce(rate_delay_s, 0))
                END AS effective_delay_s
              FROM ${pfx}rbt)"""
  }

  private val robotsRulesCtes: String =
    s"""rb AS ($domainRobotsValues),
      ${robotsRulesChainFor("", None)}"""

  /** The c43 admission verdict as a reusable CTE fragment: appends to
    * [[robotsRulesCtes]] + a frontier relation exposing (doc_id,
    * norm_url, domain, path, query_norm) the per-URL winning rule and
    * verdict, ending in `<pfx>adm`(doc_id, norm_url, domain, target,
    * matched_rule, matched_allow, allowed). The prefix keeps two
    * admission passes in one query (c44 admits sitemap locs while the
    * %7 frontier chain is also in scope) from colliding.
    */
  private def robotsAdmissionCtesOver(rel: String, pfx: String,
                                      rulesRel: String = "rbp"): String =
    s"""${pfx}rr AS (SELECT domain AS r_domain, unnest(rules) AS r
              FROM $rulesRel),
      ${pfx}rr2 AS (SELECT r_domain, r.is_allow AS r_allow,
                r.rpath AS rpath FROM ${pfx}rr),
      ${pfx}fr AS (SELECT doc_id, norm_url, domain,
               path || CASE WHEN query_norm = '' THEN ''
                            ELSE '?' || query_norm END AS target
             FROM $rel),
      ${pfx}mt AS (SELECT f.*, r2.r_allow, r2.rpath FROM ${pfx}fr f
             LEFT JOIN ${pfx}rr2 r2 ON f.domain = r2.r_domain
               AND starts_with(f.target, r2.rpath)),
      ${pfx}bst AS (SELECT * FROM ${pfx}mt
              QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY length(rpath) DESC NULLS LAST,
                  CASE WHEN r_allow THEN 1 ELSE 0 END DESC NULLS LAST,
                  rpath DESC NULLS LAST) = 1),
      ${pfx}adm AS (SELECT doc_id, norm_url, domain, target,
                rpath AS matched_rule,
                CASE WHEN rpath IS NULL THEN NULL ELSE r_allow END
                  AS matched_allow,
                (rpath IS NULL OR r_allow) AS allowed
              FROM ${pfx}bst)"""

  private val robotsAdmissionCtes: String =
    s"""$robotsRulesCtes,
      ${robotsAdmissionCtesOver("n5", "")}"""

  /** c48/c50's shared chain: the %7 frontier canon (seen set), the
    * robots rules, the sitemap plant's locs through canon + admission,
    * the per-domain advertisement lists, ending in `xdisc` — one
    * per-loc row with (sm_domain, url, sitemap_url, norm_url, domain,
    * allowed, is_foreign, trusted, already_seen). ONE definition so the
    * per-loc verdicts (c48) and the per-advertisement rollup (c50) can
    * never drift.
    */
  private val sitemapCrossCtes: String =
    s"""$urlNormCtes,
      $robotsRulesCtes,
      sm AS ($domainSitemapsValues),
      smu AS (SELECT sm_domain,
               'https://' || sm_domain || '/sitemap.xml' AS sitemap_url,
               sitemap_xml FROM sm),
      lc0 AS (SELECT sm_domain, sitemap_url,
               unnest(regexp_extract_all(sitemap_xml,
                 '<loc>([^<]*)</loc>', 1)) AS url FROM smu),
      lc AS (SELECT row_number() OVER (ORDER BY sm_domain, url) AS doc_id,
               sm_domain, sitemap_url, url FROM lc0),
      ${urlNormChainOver("lc", "q")},
      ${robotsAdmissionCtesOver("q5", "s")},
      xadv AS (SELECT domain AS a_domain, list_transform(list_filter(
                list_transform(string_split(robots_txt, chr(10)),
                  l -> trim(l)),
                l -> regexp_matches(lower(l), '^sitemap:[ ]*[^ ]')),
                l -> trim(substr(l, strpos(l, ':') + 1))) AS sitemaps
              FROM rb),
      sn AS (SELECT DISTINCT norm_url FROM n5),
      xdisc AS (SELECT lc.sm_domain, lc.url, lc.sitemap_url, a.norm_url,
        a.domain, a.allowed, (a.domain <> lc.sm_domain) AS is_foreign,
        (a.domain = lc.sm_domain OR
          coalesce(list_contains(xadv.sitemaps, lc.sitemap_url), false))
          AS trusted,
        (sn.norm_url IS NOT NULL) AS already_seen
      FROM sadm a JOIN lc USING (doc_id)
      LEFT JOIN xadv ON xadv.a_domain = a.domain
      LEFT JOIN sn ON sn.norm_url = a.norm_url)"""

  /** t40/t41's shared training CTE chain — the exact WordPiece
    * likelihood iterations (wf dictionary, v0 char seqs, per-iteration
    * sy/uf/pc/sc/tp/v), ending with tp1..tp4 (the merges) and v4. All
    * per-iteration CTEs are MATERIALIZED: the scalar-subquery chain
    * otherwise re-inlines exponentially in the consumer.
    */
  private val wordpieceTrainCtes: String = {
    val scale = 1L << 30
    val iterCtes = (1 to 4).map { i =>
      s"""sy$i AS MATERIALIZED (SELECT freq,
               string_split(trim(seq), '  ') AS sy
             FROM v${i - 1}),
      uf$i AS MATERIALIZED (SELECT u, SUM(freq) AS f
             FROM (SELECT freq, unnest(sy) AS u FROM sy$i) q GROUP BY u),
      pc$i AS (SELECT p[1] AS a, p[2] AS b, SUM(freq) AS cnt
             FROM (SELECT freq, unnest(list_transform(range(1, len(sy)),
                     j -> [sy[j], sy[j+1]])) AS p FROM sy$i
                   WHERE len(sy) > 1) q
             GROUP BY 1, 2),
      sc$i AS (SELECT a, b, cnt, ua.f AS fa, ub.f AS fb,
               (cnt * $scale) // (ua.f * ub.f) AS score_q
             FROM pc$i JOIN uf$i ua ON pc$i.a = ua.u
                       JOIN uf$i ub ON pc$i.b = ub.u),
      tp$i AS MATERIALIZED (SELECT * FROM sc$i
             ORDER BY score_q DESC, a, b LIMIT 1),
      v$i AS MATERIALIZED (SELECT word, freq,
              replace(seq,
                ' ' || (SELECT a FROM tp$i) || '  ' || (SELECT b FROM tp$i) || ' ',
                ' ' || (SELECT a FROM tp$i) || (SELECT b FROM tp$i) || ' ') AS seq
            FROM v${i - 1})"""
    }.mkString(",\n      ")
    s"""wf AS (SELECT wd AS word, COUNT(*) AS freq
                  FROM (SELECT unnest(string_split(text, ' ')) AS wd
                        FROM documents) u
                  WHERE regexp_matches(wd, '^[a-z]+$$') GROUP BY wd),
      v0 AS (SELECT word, freq, regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq
             FROM wf ORDER BY freq DESC, word LIMIT 200),
      $iterCtes"""
  }

  /** t41/t43's SHARED oracle: the full t40 training CTE stack chained
    * into the unrolled 12-step greedy walk over the t39 compound/OOV
    * plant. One string by design — the two registrations differ only
    * in the Spark-side walk (flat unit array vs first-char-bucketed
    * map) and must stay value-identical.
    */
  private val wordpieceTrainedApplySql: String = {
    def step(i: Int): String = s"""
        s$i AS (SELECT word, n_occurrences,
            pos + ml AS pos,
            n_units + CASE WHEN ml > 0 THEN 1 ELSE 0 END AS n_units,
            unk OR (pos < length(word) AND ml = 0) AS unk,
            CASE WHEN ml = 0 THEN pieces
                 WHEN pos = 0 THEN substr(word, 1, ml)
                 ELSE pieces || ' ##' || substr(word, pos + 1, ml)
            END AS pieces
          FROM (SELECT *, CASE WHEN NOT unk AND pos < length(word) THEN
                  COALESCE((SELECT MAX(length(u)) FROM units uu
                            WHERE substr(s${i - 1}.word, s${i - 1}.pos + 1,
                                         length(uu.u)) = uu.u), 0)
                ELSE 0 END AS ml FROM s${i - 1}))"""
    s"""
      WITH $wordpieceTrainCtes,
      units AS MATERIALIZED (SELECT DISTINCT u FROM (
          SELECT unnest(regexp_extract_all(word, '.')) AS u FROM v0
          UNION ALL SELECT (SELECT a || b FROM tp1)
          UNION ALL SELECT (SELECT a || b FROM tp2)
          UNION ALL SELECT (SELECT a || b FROM tp3)
          UNION ALL SELECT (SELECT a || b FROM tp4))),
      dd AS (SELECT doc_id,
          text || ' ' || CASE WHEN doc_id % 3 = 0 THEN 'joinhash'
                              WHEN doc_id % 3 = 1 THEN 'hashjoinrow'
                              ELSE 'scanqz' END AS text FROM documents),
      w AS MATERIALIZED (SELECT w AS word,
            CAST(COUNT(*) AS BIGINT) AS n_occurrences
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM dd)
          WHERE w <> '' GROUP BY w),
      s0 AS (SELECT word, n_occurrences, 0 AS pos, 0 AS n_units,
                    FALSE AS unk, '' AS pieces FROM w),
      ${(1 to 12).map(step).mkString(",\n      ")}
      SELECT word, n_occurrences, unk AS is_unk,
        CAST(CASE WHEN unk THEN 1 ELSE n_units END AS INT) AS n_units,
        CASE WHEN unk THEN '[UNK]' ELSE pieces END AS pieces
      FROM s12 ORDER BY word"""
  }

  /** t42's oracle: the t40 training stack, then `pruneIters` unrolled
    * prune rounds — each round walks the dictionary through the
    * 12-step greedy segmentation once per (candidate ∪ baseline)
    * variant with that candidate excluded, totals freq·units per
    * variant, and takes the (loss ASC, unit ASC) argmin. Every
    * iteration CTE is MATERIALIZED (the t40 scalar-subquery gotcha).
    */
  private val unigramPruneSql: String = {
    def walk(r: Int, extraNotIn: String): String = {
      val steps = (1 to 12).map { i =>
        s"""y${r}_$i AS MATERIALIZED (SELECT word, freq, cand,
             pos + ml AS pos,
             n_units + CASE WHEN ml > 0 THEN 1 ELSE 0 END AS n_units
           FROM (SELECT *, CASE WHEN pos < length(word) THEN
                   COALESCE((SELECT MAX(length(uu.u)) FROM units uu
                             WHERE uu.u IS DISTINCT FROM y${r}_${i - 1}.cand
                               $extraNotIn
                               AND substr(y${r}_${i - 1}.word,
                                 y${r}_${i - 1}.pos + 1,
                                 length(uu.u)) = uu.u), 0)
                 ELSE 0 END AS ml FROM y${r}_${i - 1}))"""
      }.mkString(",\n      ")
      s"""$steps,
      t$r AS MATERIALIZED (SELECT cand, SUM(freq * n_units) AS tok
           FROM y${r}_12 GROUP BY cand),
      b$r AS MATERIALIZED (SELECT tok FROM t$r WHERE cand IS NULL),
      p$r AS MATERIALIZED (SELECT cand, tok,
             tok - (SELECT tok FROM b$r) AS loss
           FROM t$r WHERE cand IS NOT NULL
           ORDER BY loss, cand LIMIT 1)"""
    }
    s"""
      WITH $wordpieceTrainCtes,
      units AS MATERIALIZED (SELECT DISTINCT u FROM (
          SELECT unnest(regexp_extract_all(word, '.')) AS u FROM v0
          UNION ALL SELECT (SELECT a || b FROM tp1)
          UNION ALL SELECT (SELECT a || b FROM tp2)
          UNION ALL SELECT (SELECT a || b FROM tp3)
          UNION ALL SELECT (SELECT a || b FROM tp4))),
      cands AS MATERIALIZED (SELECT u FROM units WHERE length(u) > 1),
      vw AS (SELECT word, freq FROM v0),
      y1_0 AS (SELECT word, freq, cand, 0 AS pos, 0 AS n_units
               FROM vw CROSS JOIN (SELECT u AS cand FROM cands
                                   UNION ALL SELECT NULL) c),
      ${walk(1, "")},
      y2_0 AS (SELECT word, freq, cand, 0 AS pos, 0 AS n_units
               FROM vw CROSS JOIN (SELECT u AS cand FROM cands
                                   WHERE u NOT IN (SELECT cand FROM p1)
                                   UNION ALL SELECT NULL) c),
      ${walk(2, "AND uu.u NOT IN (SELECT cand FROM p1)")}
      SELECT * FROM (
        SELECT 1 AS iter, cand AS pruned_unit,
          CAST(loss AS BIGINT) AS loss_tokens,
          CAST((SELECT tok FROM b1) AS BIGINT) AS tokens_before,
          CAST(tok AS BIGINT) AS tokens_after FROM p1
        UNION ALL SELECT 2, cand, CAST(loss AS BIGINT),
          CAST((SELECT tok FROM b2) AS BIGINT), CAST(tok AS BIGINT)
        FROM p2) z
      ORDER BY iter"""
  }

  /** t44's oracle: the t40 training stack, then 3 unrolled Viterbi-EM
    * rounds — each round builds the per-word per-prefix DP (list of
    * (n, g, p) structs: piece count, −Σ score, piece string) via 16
    * unrolled steps whose transition is a correlated argmin over the
    * round's scored units, then re-estimates scores as freq-weighted
    * use counts. Every step CTE is MATERIALIZED (the t40
    * scalar-subquery gotcha); all arithmetic BIGINT.
    */
  private val unigramViterbiEmSql: String = {
    def round(r: Int): String = {
      val steps = (1 to 16).map { i =>
        s"""e${r}_$i AS MATERIALIZED (SELECT word, freq,
             CASE WHEN $i > length(word) THEN dp
             ELSE list_append(dp, coalesce(
               (SELECT {'n': dp[$i - length(t.u) + 1].n + 1,
                        'g': dp[$i - length(t.u) + 1].g - t.s,
                        'p': dp[$i - length(t.u) + 1].p ||
                             CASE WHEN dp[$i - length(t.u) + 1].p = ''
                                  THEN '' ELSE ' ' END || t.u}
                FROM es$r t
                WHERE length(t.u) <= $i
                  AND substr(e${r}_${i - 1}.word,
                        $i - length(t.u) + 1, length(t.u)) = t.u
                ORDER BY dp[$i - length(t.u) + 1].n + 1,
                  dp[$i - length(t.u) + 1].g - t.s,
                  dp[$i - length(t.u) + 1].p ||
                    CASE WHEN dp[$i - length(t.u) + 1].p = ''
                         THEN '' ELSE ' ' END || t.u
                LIMIT 1),
               {'n': 1000000, 'g': CAST(0 AS BIGINT), 'p': ''}))
             END AS dp
           FROM e${r}_${i - 1})"""
      }.mkString(",\n      ")
      s"""e${r}_0 AS (SELECT word, freq,
             [{'n': 0, 'g': CAST(0 AS BIGINT), 'p': ''}] AS dp FROM vw),
      $steps,
      c$r AS MATERIALIZED (SELECT u, SUM(freq) AS cnt FROM (
             SELECT freq, unnest(string_split(
               dp[length(word) + 1].p, ' ')) AS u FROM e${r}_16) q
           GROUP BY u),
      es${r + 1} AS MATERIALIZED (SELECT uu.u,
             coalesce(CAST(c$r.cnt AS BIGINT), 0) AS s
           FROM units uu LEFT JOIN c$r ON c$r.u = uu.u)"""
    }
    s"""
      WITH $wordpieceTrainCtes,
      units AS MATERIALIZED (SELECT DISTINCT u FROM (
          SELECT unnest(regexp_extract_all(word, '.')) AS u FROM v0
          UNION ALL SELECT (SELECT a || b FROM tp1)
          UNION ALL SELECT (SELECT a || b FROM tp2)
          UNION ALL SELECT (SELECT a || b FROM tp3)
          UNION ALL SELECT (SELECT a || b FROM tp4))),
      vw AS (SELECT word, freq FROM v0),
      es1 AS (SELECT u, CAST(0 AS BIGINT) AS s FROM units),
      ${(1 to 3).map(round).mkString(",\n      ")}
      SELECT em_round, u AS unit, uses FROM (
        SELECT 1 AS em_round, u, s AS uses FROM es2
        UNION ALL SELECT 2, u, s FROM es3
        UNION ALL SELECT 3, u, s FROM es4) z
      ORDER BY em_round, unit"""
  }

  // ---- query definitions -----------------------------------------------

  val defs: Seq[(String, QFn, Option[String])] = Seq(

    ("d01_dedup_exact_groups", (s: SparkSession, d: String) =>
      Dedup.exactDupGroups(t(s, d, "documents")),
      Some("""
      SELECT md5(text) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS keep_id
      FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY text_md5""")),

    ("d02_dedup_exact_stats", (s: SparkSession, d: String) =>
      Dedup.exactDupStats(t(s, d, "documents")),
      Some("""
      SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique,
             COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
      FROM documents""")),

    ("d03_simhash", (s: SparkSession, d: String) =>
      Dedup.simhash(t(s, d, "documents")),
      Some(simhashOracle)),

    ("d04_simhash_dup", (s: SparkSession, d: String) =>
      Dedup.simhashDup(t(s, d, "documents"), maxHamming = 6),
      Some(simhashDupOracle)),

    ("d05_minhash_lsh_dup", (s: SparkSession, d: String) =>
      Dedup.minhashDup(t(s, d, "documents"), threshold = 0.5),
      Some(minhashOracle)),

    // ---- minhash-estimator calibration: signature-estimated vs exact
    // Jaccard on every d05 candidate pair, with absolute error — the
    // audit that justifies trusting the signature at scale. Oracle
    // compares the m0..mN signature columns componentwise ------------
    ("d40_minhash_estimator_error", (s: SparkSession, d: String) =>
      Dedup.minhashEstimatorError(t(s, d, "documents")),
      Some {
        val matchSum = Hashing.perms.indices
          .map(j => s"(CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val n = Hashing.perms.size
        s"""
      WITH $minhashCtes,
      sm AS (SELECT cand.doc_a, cand.doc_b,
               CAST($matchSum AS INT) AS n_match
             FROM cand JOIN sig sa ON sa.doc_id = cand.doc_a
                       JOIN sig sb ON sb.doc_id = cand.doc_b)
      SELECT com.doc_a, com.doc_b, n_match, n_common,
             CAST(n_match AS DOUBLE) / CAST($n.0 AS DOUBLE) AS est_jaccard,
             CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard,
             abs(CAST(n_match AS DOUBLE) / CAST($n.0 AS DOUBLE)
                 - CAST(n_common AS DOUBLE) / (na + nb - n_common))
               AS abs_err
      FROM com JOIN sm USING (doc_a, doc_b)
      ORDER BY doc_a, doc_b"""
      }),

    // ---- capped-path gates (see the hot-bucket cap fixture above):
    // identical operators and thresholds as d05/d04/d11/d19, but run
    // on the planted-hot-cluster fixture with the DEFAULT maxBucket,
    // so the HotBuckets.prune branch itself is hash-verified
    ("d31_minhash_dup_capped", (s: SparkSession, d: String) =>
      Dedup.minhashDup(docsAug(s, d), threshold = 0.5),
      Some(s"""
      WITH $docsAugSql,
      ${minhashCtesFor("docs_aug", Some(Dedup.DefaultMaxBucket))}
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
      FROM com
      WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5
      ORDER BY doc_a, doc_b""")),

    ("d32_simhash_dup_capped", (s: SparkSession, d: String) =>
      Dedup.simhashDup(docsAug(s, d), maxHamming = 6),
      Some(simhashDupOracleFor("docs_aug", Some(Dedup.DefaultMaxBucket),
        preCtes = s"$docsAugSql,"))),

    ("d33_cosine_lsh_dup_capped", (s: SparkSession, d: String) =>
      Similarity.lshCosineDupPairs(embsAug(s, d), nPlanes = 8, threshold = 0.4),
      Some(s"""
      WITH $embsAugSql,
      e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embs_aug),
      pl0 AS (SELECT vec_id, embedding FROM embs_aug ORDER BY vec_id LIMIT 8),
      pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
             FROM pl0),
      b AS (SELECT v.vec_id,
                   CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                            THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
            FROM embs_aug v CROSS JOIN pl p GROUP BY v.vec_id),
      okv AS (SELECT bucket FROM b GROUP BY bucket
              HAVING COUNT(*) <= ${Dedup.DefaultMaxBucket}),
      bc AS (SELECT b.* FROM b JOIN okv USING (bucket)),
      eb AS (SELECT e.vec_id, embedding, nrm, bucket
             FROM e JOIN bc ON e.vec_id = bc.vec_id)
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket AS bucket,
             ${dotS("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cosine
      FROM eb x JOIN eb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      WHERE ${dotS("x.embedding", "y.embedding")} / (x.nrm * y.nrm) >= 0.4
      ORDER BY vec_a, vec_b""")),

    // capped twin of d19: same bottom-K probe / inverted-index shape,
    // but with the postings cap ON (d19 itself runs uncapped because
    // its oracle predates the cap model) — hot shingles can't nominate
    ("d34_containment_asym_capped", (s: SparkSession, d: String) =>
      Dedup.containmentDupAsym(docsAug(s, d), threshold = 0.8, probeK = 4),
      Some(s"""
      WITH $docsAugSql,
      sh0 AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id, unnest($shinglesSql) AS s FROM docs_aug)),
      hh AS (SELECT DISTINCT doc_id, ${Hashing.h32Sql("s")} AS h FROM sh0),
      okh AS (SELECT h FROM hh GROUP BY h
              HAVING COUNT(*) <= ${Dedup.DefaultMaxBucket}),
      host AS (SELECT doc_id, h FROM hh JOIN okh USING (h)),
      probe AS (SELECT doc_id AS doc_a, h FROM
                  (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY h) AS rn FROM hh)
                WHERE rn <= 4),
      cand AS (SELECT p.doc_a, x.doc_id AS doc_b
               FROM probe p JOIN host x ON x.h = p.h AND x.doc_id <> p.doc_a
               GROUP BY p.doc_a, x.doc_id HAVING COUNT(*) >= 2),
      arr AS (SELECT doc_id, $shinglesSql AS sa FROM docs_aug),
      com AS (SELECT doc_a, doc_b,
                     CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                     CAST(len(a.sa) AS INT) AS na
              FROM cand JOIN arr a ON a.doc_id = doc_a
                        JOIN arr b ON b.doc_id = doc_b)
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / na AS containment
      FROM com WHERE CAST(n_common AS DOUBLE) / na >= 0.8
      ORDER BY doc_a, doc_b""")),

    // per-doc signature export: verifies every minhash value directly,
    // not just through the pairs they produce
    ("d10_minhash_signatures", (s: SparkSession, d: String) =>
      Dedup.minhashSignatures(t(s, d, "documents")).orderBy(col("doc_id")),
      Some {
        val sigCols = Hashing.perms.zipWithIndex
          .map { case ((a, b), j) => s"MIN(($a * h + $b) % $P) AS m$j" }
          .mkString(", ")
        s"""
        WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
        h AS (SELECT doc_id, $h32s AS h FROM sh)
        SELECT doc_id, $sigCols FROM h GROUP BY doc_id ORDER BY doc_id"""
      }),

    ("d09_dedup_clusters", (s: SparkSession, d: String) =>
      Dedup.dupClusters(Dedup.minhashDup(t(s, d, "documents"), threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))),
      Some(clustersOracle)),

    // ---- dup-cluster size histogram (the dedup report's headline
    // table: how much of the corpus sits in 2-clusters vs mega-
    // clusters; a fat tail means boilerplate is stitching unrelated
    // docs and the threshold/banding needs review). Docs with no dup
    // pair are out of scope by construction (the d09 contract) ------
    ("d41_dup_cluster_sizes", (s: SparkSession, d: String) =>
      Dedup.dupClusters(Dedup.minhashDup(t(s, d, "documents"),
          threshold = 0.5)
        .select(col("doc_a"), col("doc_b")))
        .groupBy(col("rep_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size")),
      Some(s"""
      WITH RECURSIVE $minhashCtes,
      dup AS (SELECT doc_a, doc_b FROM com
              WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup
                UNION SELECT doc_b, doc_a FROM dup),
      reach(src, dst) AS (
        (SELECT src, dst FROM edges UNION SELECT src, src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      cl AS (SELECT src AS doc_id, MIN(dst) AS rep_id
             FROM reach GROUP BY src),
      sz AS (SELECT rep_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
             FROM cl GROUP BY rep_id)
      SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
      FROM sz GROUP BY cluster_size ORDER BY cluster_size""")),

    // same oracle, driverThreshold = 0: forces the ITERATIVE min-label
    // shuffle loop — the actual 100 TB connected-components shape — so
    // the distributed branch is itself hash-verified, not just the
    // driver union-find the small fixture otherwise takes
    ("d09b_dedup_clusters_distributed", (s: SparkSession, d: String) =>
      Dedup.dupClusters(Dedup.minhashDup(t(s, d, "documents"), threshold = 0.5)
        .select(col("doc_a"), col("doc_b")), driverThreshold = 0L),
      Some(clustersOracle)),

    // same oracle again, via the alternating large-star/small-star
    // algorithm (Kiveris et al. SoCC'14) — O(log n) rounds vs the
    // min-label loop's O(diameter), hash-verified against the
    // identical component labeling
    ("d09c_dedup_clusters_twophase", (s: SparkSession, d: String) =>
      // driverThreshold = 0 pins the DISTRIBUTED star loop — this query
      // exists to exercise the SoCC'14 log-round path (the d09b
      // convention); composing operators (s27's core clustering) take
      // the below-broadcast driver shortcut by default
      Dedup.dupClustersTwoPhase(
        Dedup.minhashDup(t(s, d, "documents"), threshold = 0.5)
          .select(col("doc_a"), col("doc_b")), driverThreshold = 0L),
      Some(clustersOracle)),

    // near-dup RESOLUTION: per minhash-component keep the single
    // highest-quality member (the artifact a corpus dedup ships)
    ("d22_neardup_resolution", (s: SparkSession, d: String) =>
      Dedup.nearDupResolution(t(s, d, "documents"), threshold = 0.5),
      Some(nearDupResolutionOracle)),

    ("d06_ngram_jaccard_dup", (s: SparkSession, d: String) =>
      Dedup.ngramJaccardDup(t(s, d, "documents"), n = 4, maxLenDiff = 10, threshold = 0.5),
      Some(ngramJaccardOracle)),

    // the ensemble decision table: every candidate near-dup pair from
    // FOUR families (minhash Jaccard, simhash Hamming, char-n-gram
    // Jaccard, edit distance) with per-family verdicts and an
    // agreement count — what a production dedup review queue actually
    // consumes. Engine and oracle both union the families' own d04/
    // d05/d06/d26 shapes verbatim (each family's oracle nests as a
    // CTE), so the composition inherits their exactness
    ("d30_dedup_ensemble", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      def flag(df: DataFrame, name: String) =
        df.select(col("doc_a"), col("doc_b")).distinct()
          .withColumn(name, lit(true))
      // the four families are independent candidate/verify pipelines,
      // each with its own eager checkpoints — overlap their jobs
      // (guide §2.6); values are unchanged, only scheduling overlaps
      val fams = graft.core.Par.evalAll(Seq(
        () => flag(Dedup.minhashDup(docs, threshold = 0.5), "f_minhash"),
        () => flag(Dedup.simhashDup(docs, maxHamming = 6), "f_simhash"),
        () => flag(Dedup.ngramJaccardDup(docs, n = 4, maxLenDiff = 10,
          threshold = 0.5), "f_ngram"),
        () => flag(Dedup.editDistanceDup(docs, maxDist = 40), "f_edit")))
        .map(_.asInstanceOf[DataFrame])
      val allPairs = fams.map(_.select(col("doc_a"), col("doc_b")))
        .reduce(_ unionByName _).distinct()
      val joined = fams.foldLeft(allPairs) { (acc, f) =>
        acc.join(f, Seq("doc_a", "doc_b"), "left")
      }
      val flags = Seq("f_minhash", "f_simhash", "f_ngram", "f_edit")
      flags.foldLeft(joined) { (df, f) =>
          df.withColumn(f, coalesce(col(f), lit(false)))
        }
        .withColumn("n_families",
          flags.map(f => when(col(f), 1).otherwise(0)).reduce(_ + _))
        .orderBy(col("doc_a"), col("doc_b"))
    }, Some(s"""
      WITH mh AS ($minhashOracle),
      shq AS ($simhashDupOracle),
      ngq AS ($ngramJaccardOracle),
      edq AS (
        WITH d AS (SELECT doc_id, lang, n_chars, text FROM documents
                   WHERE doc_id % 2 = 0 AND length(text) = strlen(text)),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     levenshtein(a.text, b.text) AS dist
              FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
                AND abs(a.n_chars - b.n_chars) <= 5)
        SELECT doc_a, doc_b FROM p WHERE dist <= 40),
      u AS (SELECT doc_a, doc_b FROM mh UNION
            SELECT doc_a, doc_b FROM shq UNION
            SELECT doc_a, doc_b FROM ngq UNION
            SELECT doc_a, doc_b FROM edq),
      m2 AS (SELECT DISTINCT doc_a, doc_b, TRUE AS f FROM mh),
      s2 AS (SELECT DISTINCT doc_a, doc_b, TRUE AS f FROM shq),
      n2 AS (SELECT DISTINCT doc_a, doc_b, TRUE AS f FROM ngq),
      e2 AS (SELECT DISTINCT doc_a, doc_b, TRUE AS f FROM edq)
      SELECT u.doc_a, u.doc_b,
             COALESCE(m2.f, FALSE) AS f_minhash,
             COALESCE(s2.f, FALSE) AS f_simhash,
             COALESCE(n2.f, FALSE) AS f_ngram,
             COALESCE(e2.f, FALSE) AS f_edit,
             CAST(CASE WHEN m2.f THEN 1 ELSE 0 END
               + CASE WHEN s2.f THEN 1 ELSE 0 END
               + CASE WHEN n2.f THEN 1 ELSE 0 END
               + CASE WHEN e2.f THEN 1 ELSE 0 END AS INT) AS n_families
      FROM u
      LEFT JOIN m2 ON u.doc_a = m2.doc_a AND u.doc_b = m2.doc_b
      LEFT JOIN s2 ON u.doc_a = s2.doc_a AND u.doc_b = s2.doc_b
      LEFT JOIN n2 ON u.doc_a = n2.doc_a AND u.doc_b = n2.doc_b
      LEFT JOIN e2 ON u.doc_a = e2.doc_a AND u.doc_b = e2.doc_b
      ORDER BY u.doc_a, u.doc_b""")),

    // dedup-rate dashboard: per SOURCE, how much of its contribution is
    // exact-duplicated or near-duplicated — the operational question
    // dedup reporting answers ("which feed is polluting the corpus").
    // Near-dup membership reuses d05's pair oracle; the engine runs
    // uncapped so both sides compute the same candidate set
    ("d29_dup_rate_by_source", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val exactDup = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("nc"))
        .filter(col("nc") > 1).select(col("h"))
      val exactIds = docs.join(exactDup,
          md5(col("text")) === col("h"), "left_semi")
        .select(col("doc_id")).withColumn("__exact", lit(1))
      val pairs = Dedup.minhashDup(docs, threshold = 0.5,
        maxBucket = Int.MaxValue)
      val nearIds = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .distinct().withColumn("__near", lit(1))
      docs.join(exactIds.select(col("doc_id"), col("__exact")), Seq("doc_id"), "left")
        .join(nearIds, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("__exact")).as("n_exact_dup"),
          count(col("__near")).as("n_near_dup"))
        .withColumn("near_pct",
          col("n_near_dup").cast("double") / col("n_docs").cast("double"))
        .orderBy(col("source"))
    }, Some(s"""
      WITH $minhashCtes,
      dup AS (SELECT doc_a, doc_b FROM com
              WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
      near AS (SELECT DISTINCT doc_id FROM
                 (SELECT doc_a AS doc_id FROM dup
                  UNION ALL SELECT doc_b FROM dup) u),
      eh AS (SELECT md5(text) AS h FROM documents GROUP BY md5(text)
             HAVING COUNT(*) > 1)
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(CASE WHEN md5(d.text) IN (SELECT h FROM eh)
               THEN 1 END) AS BIGINT) AS n_exact_dup,
             CAST(COUNT(CASE WHEN d.doc_id IN (SELECT doc_id FROM near)
               THEN 1 END) AS BIGINT) AS n_near_dup,
             CAST(COUNT(CASE WHEN d.doc_id IN (SELECT doc_id FROM near)
               THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS near_pct
      FROM documents d GROUP BY d.source ORDER BY d.source""")),

    // ---- duplicate-flow matrix: near-dup pairs aggregated by SOURCE
    // pair with direction by ingestion order (doc_a < doc_b and
    // doc_id is ingestion order — the t21 convention — so src_a is
    // the earlier/"original" side): which feed copies which, the
    // provenance question d29's per-source rates can't answer --------
    ("d43_dup_flow", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashDup(docs, threshold = 0.5,
        maxBucket = Int.MaxValue).select(col("doc_a"), col("doc_b"))
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.toDF("doc_a", "src_a"), Seq("doc_a"))
        .join(src.toDF("doc_b", "src_b"), Seq("doc_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }, Some(s"""
      WITH $minhashCtes,
      dup AS (SELECT doc_a, doc_b FROM com
              WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5)
      SELECT sa.source AS src_a, sb.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM dup
      JOIN documents sa ON sa.doc_id = dup.doc_a
      JOIN documents sb ON sb.doc_id = dup.doc_b
      GROUP BY 1, 2 ORDER BY src_a, src_b""")),

    // ---- dup-graph transitivity: global clustering coefficient of
    // the near-dup pair graph — 3·triangles vs wedges, exact ppm. The
    // threshold-coherence audit: similarity is metric-ish, so a sound
    // threshold yields high transitivity; a low value means the pair
    // set is chains of borderline matches (threshold too loose) ------
    ("d44_dup_transitivity", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.minhashDup(docs, threshold = 0.5,
        maxBucket = Int.MaxValue)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      val und = pairs
        .unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
        .cpGuard() // degree count + two triangle-join sides
      val wedges = und.groupBy(col("u"))
        .agg(count(lit(1)).as("dg"))
        .agg(sum(expr("dg * (dg - 1) div 2")).as("n"))
        .select(lit("wedges").as("stat"), col("n").cast("long").as("n"))
      // closed triples: ordered triangles (a<b<c) via two joins over
      // the a<b half, each triangle counted once then tripled
      val half = pairs
      val tri = half.toDF("a", "b")
        .join(half.toDF("b", "c"), Seq("b"))
        .join(half.toDF("a", "c"), Seq("a", "c"), "left_semi")
        .agg(count(lit(1)).as("n"))
        .select(lit("triangles").as("stat"), col("n"))
      wedges.unionAll(tri).orderBy(col("stat"))
    }, Some(s"""
      WITH $minhashCtes,
      dup AS (SELECT doc_a AS u, doc_b AS v FROM com
              WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
      und AS (SELECT u, v FROM dup UNION ALL SELECT v, u FROM dup),
      dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dgc
             FROM und GROUP BY u),
      w AS (SELECT 'wedges' AS stat,
              CAST(SUM(dgc * (dgc - 1) // 2) AS BIGINT) AS n FROM dg),
      tr AS (SELECT 'triangles' AS stat, CAST(COUNT(*) AS BIGINT) AS n
             FROM dup ab JOIN dup bc ON bc.u = ab.v
             WHERE EXISTS (SELECT 1 FROM dup ac
                           WHERE ac.u = ab.u AND ac.v = bc.v))
      SELECT stat, n FROM tr
      UNION ALL SELECT stat, n FROM w ORDER BY stat""")),

    // ---- replica reconciliation (Merkle-style bucket digests) ----
    // "did the copy land intact?" for tables too big to compare by
    // moving them: phase 1 ships only `buckets` counter rows per side
    // (d24); phase 2 joins full rows ONLY inside mismatched buckets
    // (d25). The divergent replica is derived in-query: drop every
    // 997th doc, append ' v2' to every 499th's text.
    ("d24_table_diff", (s: SparkSession, d: String) => {
      val a = t(s, d, "documents")
      Reconcile.tableDiff(a, reconcileV2(a), "doc_id", ReconcileCols,
        buckets = 64)
    }, Some(s"""
      WITH $reconcileCtes
      SELECT COALESCE(da.bucket, db.bucket) AS bucket,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
             COALESCE(digest_a, 0) AS digest_a, COALESCE(digest_b, 0) AS digest_b,
             (COALESCE(n_a, 0) = COALESCE(n_b, 0) AND
              COALESCE(digest_a, 0) = COALESCE(digest_b, 0)) AS is_match
      FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
      ORDER BY bucket""")),

    // digest MERGE IDENTITY as an oracle-checked VALUE (the d18/w08
    // pattern): per-bucket digests rebuilt from parity halves and
    // summed == direct whole-table digests — the order-independent
    // additivity that lets StreamReconcile accumulate replica digests
    // one micro-batch partition at a time and still compare exactly
    ("d35_digest_merge_identity", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val cols = Seq("doc_id", "text", "lang")
      def dig(df: DataFrame) = Reconcile.bucketDigests(df, "doc_id", cols, 64)
      val merged = dig(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(dig(docs.filter(col("doc_id") % 2 === 1)))
        .groupBy(col("bucket"))
        .agg(sum(col("n")).as("n_merged"), sum(col("digest")).as("digest_merged"))
      val direct = dig(docs).select(col("bucket"),
        col("n").as("n_direct"), col("digest").as("digest_direct"))
      merged.join(direct, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_merged"), lit(0L)).as("n_merged"),
          coalesce(col("n_direct"), lit(0L)).as("n_direct"),
          coalesce(col("digest_merged"), lit(0L)).as("digest_merged"),
          coalesce(col("digest_direct"), lit(0L)).as("digest_direct"))
        .withColumn("merge_exact",
          col("n_merged") === col("n_direct") &&
            col("digest_merged") === col("digest_direct"))
        .orderBy(col("bucket"))
    }, Some(s"""
      WITH rh AS (SELECT doc_id,
                    ${Hashing.h32Sql("CAST(doc_id AS VARCHAR)")} % 64 AS bucket,
                    ${Reconcile.rowHashSql(Seq("doc_id", "text", "lang"))} AS rh
                  FROM documents),
      halves AS (SELECT bucket, COUNT(*) AS n, SUM(rh) AS dg
                 FROM rh WHERE doc_id % 2 = 0 GROUP BY bucket
                 UNION ALL
                 SELECT bucket, COUNT(*) AS n, SUM(rh) AS dg
                 FROM rh WHERE doc_id % 2 = 1 GROUP BY bucket),
      mg AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_merged,
                    CAST(SUM(dg) AS BIGINT) AS digest_merged
             FROM halves GROUP BY bucket),
      dr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_direct,
                    CAST(SUM(rh) AS BIGINT) AS digest_direct
             FROM rh GROUP BY bucket)
      SELECT COALESCE(mg.bucket, dr.bucket) AS bucket,
             COALESCE(n_merged, 0) AS n_merged,
             COALESCE(n_direct, 0) AS n_direct,
             COALESCE(digest_merged, 0) AS digest_merged,
             COALESCE(digest_direct, 0) AS digest_direct,
             (COALESCE(n_merged, 0) = COALESCE(n_direct, 0) AND
              COALESCE(digest_merged, 0) = COALESCE(digest_direct, 0))
               AS merge_exact
      FROM mg FULL OUTER JOIN dr ON mg.bucket = dr.bucket
      ORDER BY bucket""")),

    ("d25_table_diff_drill", (s: SparkSession, d: String) => {
      val a = t(s, d, "documents")
      Reconcile.tableDiffDrill(a, reconcileV2(a), "doc_id", ReconcileCols,
        buckets = 64)
    }, Some(s"""
      WITH $reconcileCtes,
      bad AS (SELECT COALESCE(da.bucket, db.bucket) AS bucket
              FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
              WHERE NOT (COALESCE(n_a, 0) = COALESCE(n_b, 0) AND
                         COALESCE(digest_a, 0) = COALESCE(digest_b, 0))),
      ra AS (SELECT doc_id, ${reconcileBucketSql} AS bucket,
                    ${Reconcile.rowHashSql(ReconcileCols)} AS rh
             FROM documents),
      rb AS (SELECT doc_id, ${reconcileBucketSql} AS bucket,
                    ${Reconcile.rowHashSql(ReconcileCols)} AS rh
             FROM b2),
      fa AS (SELECT ra.* FROM ra JOIN bad USING (bucket)),
      fb AS (SELECT rb.* FROM rb JOIN bad USING (bucket))
      SELECT COALESCE(fa.doc_id, fb.doc_id) AS doc_id,
             CASE WHEN fa.doc_id IS NULL THEN 'added'
                  WHEN fb.doc_id IS NULL THEN 'deleted'
                  WHEN fa.rh <> fb.rh THEN 'modified' END AS status
      FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
      WHERE (fa.doc_id IS NULL OR fb.doc_id IS NULL OR fa.rh <> fb.rh)
      ORDER BY doc_id""")),

    // deterministic sketch: the KMV estimate verifies value-for-value
    // (same portable hash both engines), not just "close enough"
    ("d13_kmv_distinct", (s: SparkSession, d: String) =>
      Dedup.kmvDistinct(t(s, d, "documents"), k = 256),
      Some("""
      WITH h AS (SELECT DISTINCT ('0x'||substr(md5(text),1,8))::BIGINT AS hv FROM documents),
      kmv AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                     CAST(MAX(hv) AS BIGINT) AS kth_hash,
                     CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                          ELSE (CAST(COUNT(*) - 1 AS DOUBLE) * 4294967296.0) / MAX(hv)
                     END AS estimate
              FROM (SELECT hv FROM h ORDER BY hv LIMIT 256) z)
      SELECT CAST((SELECT COUNT(DISTINCT md5(text)) FROM documents) AS BIGINT) AS n_exact,
             k_used, kth_hash, estimate
      FROM kmv""")),

    // HyperLogLog distinct sketch: 2^8 rank-max registers from the
    // portable hash; rank via integer bit-smear + bit_count and a
    // dyadic-rational denominator, so the ESTIMATE itself verifies
    // bit-for-bit cross-engine (see Dedup.hllDistinct)
    ("d16_hll_distinct", (s: SparkSession, d: String) =>
      Dedup.hllDistinct(t(s, d, "documents"), p = 8),
      Some(s"""
      WITH hh AS (SELECT ${Hashing.h32Sql("text")} AS hv FROM documents),
      b AS (SELECT hv >> 24 AS bucket, hv & 16777215 AS w FROM hh),
      s1 AS (SELECT bucket, w | (w >> 1) AS v FROM b),
      s2 AS (SELECT bucket, v | (v >> 2) AS v FROM s1),
      s4 AS (SELECT bucket, v | (v >> 4) AS v FROM s2),
      s8 AS (SELECT bucket, v | (v >> 8) AS v FROM s4),
      s16 AS (SELECT bucket, v | (v >> 16) AS v FROM s8),
      r AS (SELECT bucket, 25 - bit_count(v) AS rho FROM s16),
      regs AS (SELECT bucket, MAX(rho) AS m_rho FROM r GROUP BY bucket),
      summ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                      SUM(CAST(1 AS DOUBLE) /
                          CAST(CAST(1 AS BIGINT) << m_rho AS DOUBLE)) AS sum_used
               FROM regs)
      SELECT CAST((SELECT COUNT(DISTINCT md5(text)) FROM documents) AS BIGINT) AS n_exact,
             n_buckets_used,
             sum_used + (CAST(256 AS DOUBLE) - CAST(n_buckets_used AS DOUBLE)) AS denom,
             (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
               * CAST(256 AS DOUBLE) * CAST(256 AS DOUBLE)
               / (sum_used + (CAST(256 AS DOUBLE) - CAST(n_buckets_used AS DOUBLE))) AS estimate
      FROM summ""")),

    // HLL register MERGE across hourly slices of the event stream:
    // max-of-maxes == global max, so merged and direct estimates must be
    // EQUAL doubles (the property that makes per-executor/per-window
    // register state combinable) — asserted as a value, merge_exact
    ("d18_hll_slice_merge", (s: SparkSession, d: String) =>
      Dedup.hllSliceMerge(t(s, d, "events"), p = 8),
      Some {
        val est = (regs: String) =>
          s"""(SELECT (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
                 * CAST(256 AS DOUBLE) * CAST(256 AS DOUBLE)
                 / (SUM(CAST(1 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << m_rho AS DOUBLE))
                    + (CAST(256 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)))
              FROM $regs)"""
        s"""
      WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS slice,
                        ${Hashing.h32Sql("CAST(user_id AS VARCHAR)")} AS hv
                 FROM events),
      b AS (SELECT slice, hv >> 24 AS bucket, hv & 16777215 AS w FROM h),
      s1 AS (SELECT slice, bucket, w | (w >> 1) AS v FROM b),
      s2 AS (SELECT slice, bucket, v | (v >> 2) AS v FROM s1),
      s4 AS (SELECT slice, bucket, v | (v >> 4) AS v FROM s2),
      s8 AS (SELECT slice, bucket, v | (v >> 8) AS v FROM s4),
      s16 AS (SELECT slice, bucket, v | (v >> 16) AS v FROM s8),
      r AS (SELECT slice, bucket, 25 - bit_count(v) AS rho FROM s16),
      sliced AS (SELECT slice, bucket, MAX(rho) AS m_rho FROM r GROUP BY slice, bucket),
      merged AS (SELECT bucket, MAX(m_rho) AS m_rho FROM sliced GROUP BY bucket),
      direct AS (SELECT bucket, MAX(rho) AS m_rho FROM r GROUP BY bucket)
      SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_exact,
             CAST((SELECT COUNT(DISTINCT time_bucket(INTERVAL '1 hour', ts)) FROM events) AS BIGINT) AS n_slices,
             ${est("merged")} AS merged_estimate,
             ${est("direct")} AS direct_estimate,
             ${est("merged")} = ${est("direct")} AS merge_exact"""
      }),

    // scalar value-distribution drift between the two halves of the
    // event stream (the s28 monitor for metrics instead of
    // embeddings): fixed-width bins, integer counts, shares as exact
    // single divisions — the pre/post-deploy distribution diff
    ("w19_value_drift", (s: SparkSession, d: String) => {
      val cut = "TIMESTAMP '2024-01-16 00:00:00'"
      val binned = Tables.spread(t(s, d, "events"))
        .select(floor(col("value") / 50).cast("long").as("bin"),
          (col("ts") < expr(cut)).as("ha"))
      val agg = binned.groupBy(col("bin")).agg(
        sum(when(col("ha"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("ha"), 1L).otherwise(0L)).as("n_b"))
      val tot = agg.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
      agg.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_a"), col("n_b"),
          (col("n_a").cast("double") / col("ta")).as("share_a"),
          (col("n_b").cast("double") / col("tb")).as("share_b"),
          (col("n_a").cast("double") / col("ta") -
            col("n_b").cast("double") / col("tb")).as("share_delta"))
        .orderBy(col("bin"))
    }, Some("""
      WITH b AS (SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bin,
                        ts < TIMESTAMP '2024-01-16 00:00:00' AS ha
                 FROM events),
      a AS (SELECT bin,
                   CAST(SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN ha THEN 0 ELSE 1 END) AS BIGINT) AS n_b
            FROM b GROUP BY 1),
      tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM a)
      SELECT bin, n_a, n_b,
             CAST(n_a AS DOUBLE) / ta AS share_a,
             CAST(n_b AS DOUBLE) / tb AS share_b,
             CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb AS share_delta
      FROM a, tot ORDER BY bin""")),

    // SLIDING trailing-3h distinct users from the hourly HLL slices —
    // the d18 merge identity put to operational use: per-window
    // registers are max-merges of the persisted hourly state, never a
    // re-scan; the window mapping is slice-explode + equi-join (no
    // range join); exact trailing distinct rides along as the audit
    ("w18_sliding_distinct_hll", (s: SparkSession, d: String) =>
      Dedup.slidingDistinctHll(t(s, d, "events"), trailingHours = 3, p = 8),
      Some {
        val est =
          s"""(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
                 * CAST(256 AS DOUBLE) * CAST(256 AS DOUBLE)
                 / (SUM(CAST(1 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << m_rho AS DOUBLE))
                    + (CAST(256 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)))"""
        s"""
      WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS slice,
                        ${Hashing.h32Sql("CAST(user_id AS VARCHAR)")} AS hv,
                        user_id
                 FROM events),
      b AS (SELECT slice, user_id, hv >> 24 AS bucket, hv & 16777215 AS w FROM h),
      s1 AS (SELECT slice, user_id, bucket, w | (w >> 1) AS v FROM b),
      s2 AS (SELECT slice, user_id, bucket, v | (v >> 2) AS v FROM s1),
      s4 AS (SELECT slice, user_id, bucket, v | (v >> 4) AS v FROM s2),
      s8 AS (SELECT slice, user_id, bucket, v | (v >> 8) AS v FROM s4),
      s16 AS (SELECT slice, user_id, bucket, v | (v >> 16) AS v FROM s8),
      r AS (SELECT slice, user_id, bucket, 25 - bit_count(v) AS rho FROM s16),
      sliced AS (SELECT slice, bucket, MAX(rho) AS m_rho FROM r GROUP BY 1, 2),
      wins AS (SELECT DISTINCT slice AS win FROM sliced),
      smap AS (SELECT x.slice, w.win
               FROM (SELECT DISTINCT slice FROM sliced) x JOIN wins w
               ON w.win >= x.slice AND w.win <= x.slice + INTERVAL 2 HOUR),
      merged AS (SELECT smap.win, sliced.bucket, MAX(sliced.m_rho) AS m_rho
                 FROM sliced JOIN smap ON sliced.slice = smap.slice
                 GROUP BY 1, 2),
      est AS (SELECT win, $est AS hll_estimate FROM merged GROUP BY win),
      ex AS (SELECT smap.win, CAST(COUNT(DISTINCT r.user_id) AS BIGINT) AS n_exact
             FROM r JOIN smap ON r.slice = smap.slice GROUP BY 1)
      SELECT est.win, ex.n_exact, est.hll_estimate
      FROM est JOIN ex USING (win) ORDER BY win"""
      }),

    // HLL sketch algebra: distinct-user overlap of two event types
    // from register state alone — union by per-bucket MAX, intersection
    // by inclusion-exclusion. The overlap answer at 100 TB without a
    // set join; the exact semi-join count rides along as the audit
    ("d27_hll_intersection", (s: SparkSession, d: String) =>
      Dedup.hllIntersection(t(s, d, "events"), "view", "purchase", p = 8),
      Some {
        val est = (regs: String) =>
          s"""(SELECT (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
                 * CAST(256 AS DOUBLE) * CAST(256 AS DOUBLE)
                 / (SUM(CAST(1 AS DOUBLE) / CAST(CAST(1 AS BIGINT) << m_rho AS DOUBLE))
                    + (CAST(256 AS DOUBLE) - CAST(COUNT(*) AS DOUBLE)))
              FROM $regs)"""
        s"""
      WITH h AS (SELECT event_type,
                        ${Hashing.h32Sql("CAST(user_id AS VARCHAR)")} AS hv
                 FROM events WHERE event_type IN ('view', 'purchase')),
      b AS (SELECT event_type, hv >> 24 AS bucket, hv & 16777215 AS w FROM h),
      s1 AS (SELECT event_type, bucket, w | (w >> 1) AS v FROM b),
      s2 AS (SELECT event_type, bucket, v | (v >> 2) AS v FROM s1),
      s4 AS (SELECT event_type, bucket, v | (v >> 4) AS v FROM s2),
      s8 AS (SELECT event_type, bucket, v | (v >> 8) AS v FROM s4),
      s16 AS (SELECT event_type, bucket, v | (v >> 16) AS v FROM s8),
      r AS (SELECT event_type, bucket, 25 - bit_count(v) AS rho FROM s16),
      pt AS (SELECT event_type, bucket, MAX(rho) AS m_rho FROM r GROUP BY 1, 2),
      ra AS (SELECT bucket, m_rho FROM pt WHERE event_type = 'view'),
      rb AS (SELECT bucket, m_rho FROM pt WHERE event_type = 'purchase'),
      ru AS (SELECT bucket, MAX(m_rho) AS m_rho FROM pt GROUP BY bucket)
      SELECT ${est("ra")} AS est_a, ${est("rb")} AS est_b,
             ${est("ru")} AS est_union,
             (${est("ra")} + ${est("rb")}) - ${est("ru")} AS est_intersection,
             CAST((SELECT COUNT(DISTINCT e1.user_id) FROM events e1
                   WHERE e1.event_type = 'view' AND e1.user_id IN
                     (SELECT user_id FROM events WHERE event_type = 'purchase'))
               AS BIGINT) AS n_exact_intersection"""
      }),

    // Jaccard-CONTAINMENT dedup: |A^B| / min(|A|,|B|) over the same
    // minhash-band candidates as d05 — catches near-superset pairs
    // (boilerplate wrappers, quoted replies) that plain Jaccard
    // under-scores when doc sizes differ
    ("d17_containment_dup", (s: SparkSession, d: String) =>
      Dedup.containmentDup(t(s, d, "documents"), threshold = 0.7),
      Some(s"""
      WITH $minhashCtes
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / LEAST(na, nb) AS containment
      FROM com
      WHERE CAST(n_common AS DOUBLE) / LEAST(na, nb) >= 0.7
      ORDER BY doc_a, doc_b""")),

    // asymmetric containment: bottom-K shingle-hash probes against the
    // inverted shingle index — DIRECTED small-in-large recall that
    // symmetric banding (d17) cannot have; |A^B|/|A| verified exactly
    // maxBucket = MaxValue here: the DuckDB twin does not model the
    // HotBuckets postings cap, so the gated query runs uncapped — engine
    // and oracle compute the same candidate set by construction at any
    // corpus size (the production default keeps the cap; its recall cost
    // is what d21 measures)
    ("d19_containment_asym", (s: SparkSession, d: String) =>
      Dedup.containmentDupAsym(t(s, d, "documents"), threshold = 0.8,
        probeK = 4, maxBucket = Int.MaxValue),
      Some(s"""
      WITH sh0 AS (SELECT DISTINCT doc_id, s FROM
                     (SELECT doc_id, unnest($shinglesSql) AS s FROM documents)),
      hh AS (SELECT DISTINCT doc_id, ${Hashing.h32Sql("s")} AS h FROM sh0),
      probe AS (SELECT doc_id AS doc_a, h FROM
                  (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY h) AS rn FROM hh)
                WHERE rn <= 4),
      cand AS (SELECT p.doc_a, x.doc_id AS doc_b
               FROM probe p JOIN hh x ON x.h = p.h AND x.doc_id <> p.doc_a
               GROUP BY p.doc_a, x.doc_id HAVING COUNT(*) >= 2),
      arr AS (SELECT doc_id, $shinglesSql AS sa FROM documents),
      com AS (SELECT doc_a, doc_b,
                     CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                     CAST(len(a.sa) AS INT) AS na
              FROM cand JOIN arr a ON a.doc_id = doc_a
                        JOIN arr b ON b.doc_id = doc_b)
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / na AS containment
      FROM com WHERE CAST(n_common AS DOUBLE) / na >= 0.8
      ORDER BY doc_a, doc_b""")),

    // LSH near-dedup recall measured in-engine (the dedup twin of s07)
    // on a FIXED 1200-doc sample (contains near-dup pairs at sf0.01 AND
    // sf0.1), so the exact all-pairs baseline costs the same at every
    // sf. minhashDup's verified output is by
    // construction the subset of true pairs whose docs band-collide, so
    // recall = |lsh| / |exact| with no pair join.
    // the LSH TUNING CURVE for near-dedup (the s23 discipline applied
    // to minhash): recall at band shapes (8x2 / 4x4 / 2x8) of the
    // 16-perm signature against the same fixed-sample exact baseline
    // d20 uses — the bands-vs-rows knob every LSH dedup deployment
    // sets from exactly this measurement (shorter bands collide more:
    // higher recall, more candidates to verify). The exact baseline is
    // computed ONCE behind a localCheckpoint; each sweep point's
    // oracle nests the shaped banding verbatim over a shared signature
    ("d36_lsh_band_sweep", (s: SparkSession, d: String) => {
      val sample = Tables.spread(
        t(s, d, "documents").filter(col("doc_id") < 1200)).cpGuard()
      // the exact-baseline chain and the signature pass are independent
      // eager pipelines over the checkpointed sample — overlap their
      // jobs (guide §2.6); the signature is computed ONCE and every
      // band shape cuts it (minhashDupShapedFromSig), instead of
      // re-shingling + re-hashing the sample per sweep point
      val (exactN, sig) = graft.core.Par.eval2(
        {
          val arr = sample.select(col("doc_id"),
            array_sort(TextOps.wordShingles(col("text"), Dedup.ShingleSize))
              .as("sa"))
            .cpGuard()
          def nc =
            graft.functions.SortedIntersectCount(col("a.sa"), col("b.sa"))
          arr.as("a")
            .join(arr.as("b"), col("a.doc_id") < col("b.doc_id"))
            .filter(size(col("a.sa")) + size(col("b.sa")) > 0)
            .select((nc.cast("double") /
              (size(col("a.sa")) + size(col("b.sa")) - nc)).as("j"))
            .filter(col("j") >= 0.5)
            .agg(count(lit(1)).as("n_exact")).cpGuard()
        },
        Dedup.minhashSignatures(sample).cpGuard())
      val shapes = Seq((8, 2), (4, 4), (2, 8))
      // each sweep point's candidate/verify checkpoints read only the
      // checkpointed signature + sample — overlap the three builds
      val duped = graft.core.Par.evalAll(shapes.map { case (b, r) => () =>
        Dedup.minhashDupShapedFromSig(sig, sample, threshold = 0.5,
          bands = b, rows = r)
      })
      shapes.zip(duped).map { case ((b, r), dup) =>
        val lshN = dup.asInstanceOf[DataFrame]
          .agg(count(lit(1)).as("n_lsh"))
        exactN.crossJoin(lshN).select(
          lit(b).cast("int").as("n_bands"),
          lit(r).cast("int").as("rows_per_band"),
          col("n_exact"), col("n_lsh"),
          (col("n_lsh").cast("double") /
            greatest(col("n_exact"), lit(1L)).cast("double")).as("recall"))
      }.reduce(_ unionAll _).orderBy(col("n_bands").desc)
    }, Some {
      def point(b: Int, r: Int) = s"""
      bands_${b}_$r AS (${bandSelectsSqlShaped("sig", b, r)}),
      cand_${b}_$r AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
          FROM bands_${b}_$r x JOIN bands_${b}_$r y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
             AND x.doc_id < y.doc_id),
      lshn_${b}_$r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh
          FROM cand_${b}_$r c JOIN sarr a ON a.doc_id = c.doc_a
               JOIN sarr b2 ON b2.doc_id = c.doc_b
          WHERE CAST(len(list_intersect(a.sa, b2.sa)) AS DOUBLE)
                / (len(a.sa) + len(b2.sa) - len(list_intersect(a.sa, b2.sa)))
                >= 0.5)"""
      def sel(b: Int, r: Int) = s"""
      SELECT CAST($b AS INT) AS n_bands, CAST($r AS INT) AS rows_per_band,
             (SELECT n_exact FROM exn) AS n_exact,
             (SELECT n_lsh FROM lshn_${b}_$r) AS n_lsh,
             CAST((SELECT n_lsh FROM lshn_${b}_$r) AS DOUBLE)
               / CAST(GREATEST((SELECT n_exact FROM exn), 1) AS DOUBLE)
               AS recall"""
      val shapes = Seq((8, 2), (4, 4), (2, 8))
      s"""
      WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s
                  FROM (SELECT * FROM documents WHERE doc_id < 1200)),
      h AS (SELECT doc_id, $h32s AS h FROM sh),
      sig AS (SELECT doc_id, $sigColsSql FROM h GROUP BY doc_id),
      sarr AS (SELECT doc_id, $shinglesSql AS sa FROM documents
               WHERE doc_id < 1200),
      exn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
              FROM sarr a JOIN sarr b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.sa, b.sa)) AS DOUBLE)
                    / (len(a.sa) + len(b.sa) - len(list_intersect(a.sa, b.sa)))
                    >= 0.5),
      ${shapes.map { case (b, r) => point(b, r) }.mkString(",")}
      SELECT * FROM (${shapes.map { case (b, r) => sel(b, r) }
        .mkString(" UNION ALL ")}) s
      ORDER BY n_bands DESC"""
    }),

    // LOSSLESS set-similarity self-join: prefix filtering (AllPairs /
    // PPJoin) instead of LSH banding. The oracle is deliberately the
    // BRUTE-FORCE all-pairs exact Jaccard with no knowledge of the
    // prefix scheme — equality proves the rarest-first prefix index
    // generates every qualifying candidate (zero false negatives),
    // which is the theorem the operator's scale claim rests on.
    ("d37_prefix_jaccard_dup", (s: SparkSession, d: String) =>
      Dedup.prefixJaccardDup(t(s, d, "documents"), num = 1, denom = 2),
      Some(s"""
      WITH tk AS (SELECT doc_id, unnest($shinglesSql) AS tok
                  FROM documents),
      tok AS (SELECT doc_id, tok FROM tk WHERE tok <> ''),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n FROM tok GROUP BY 1),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(COUNT(*) AS INT) AS n_common
                FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
      FROM pairs
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
      WHERE n_common * 2 >= (sa.n + sb.n - n_common)
      ORDER BY doc_a, doc_b""")),

    // cross-doc shared SUBSTRING spans (Lee et al. 2022) as relational
    // diagonals: positional 5-gram equi-join (grams > 50 occurrences
    // excluded by a deterministic frequency threshold), maximal
    // consecutive runs per (pair, diagonal) via gaps-and-islands in a
    // partitioned window; spans of >= 4 consecutive matches = >= 8
    // shared tokens. The oracle reproduces positions, the frequency
    // filter, the diagonals and the run detection
    ("d38_substring_spans", (s: SparkSession, d: String) =>
      Dedup.substringSpans(t(s, d, "documents"), n = 5, minRun = 4,
        maxOcc = 50L),
      Some(s"""
      WITH pw AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws
                  FROM documents),
      ps AS (SELECT doc_id, CAST(unnest(range(len(ws) - 4)) AS INT) AS pos, ws
             FROM pw WHERE len(ws) >= 5),
      sh AS (SELECT doc_id, pos,
                    concat_ws(' ', ws[pos+1], ws[pos+2], ws[pos+3],
                              ws[pos+4], ws[pos+5]) AS s
             FROM ps),
      rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50),
      r AS (SELECT doc_id, pos, s FROM sh WHERE s IN (SELECT s FROM rare)),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pa, a.pos - b.pos AS d
            FROM r a JOIN r b USING (s) WHERE a.doc_id < b.doc_id),
      g AS (SELECT doc_a, doc_b, d, pa,
                   pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, d
                     ORDER BY pa) AS grp
            FROM m),
      runs AS (SELECT doc_a, doc_b, d, MIN(pa) AS sa,
                      CAST(COUNT(*) AS BIGINT) AS run
               FROM g GROUP BY doc_a, doc_b, d, grp)
      SELECT doc_a, doc_b, CAST(sa AS BIGINT) AS start_a,
             CAST(sa - d AS BIGINT) AS start_b,
             CAST(run + 4 AS BIGINT) AS span_tokens
      FROM runs WHERE run >= 4
      ORDER BY doc_a, doc_b, start_a, start_b""")),

    // incremental substring spans: NEW (odd-id) docs probed against the
    // EXISTING (even-id) corpus only — the substring twin of c04's
    // incremental minhash dedup; the frequency threshold uses CORPUS
    // occurrence counts (the stats a persisted positional posting
    // index carries), so each batch probe is O(batch), never O(corpus)
    ("d39_substring_spans_incr", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Dedup.substringSpansAgainst(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        n = 5, minRun = 4, maxOcc = 50L)
    }, Some(s"""
      WITH pw AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws
                  FROM documents),
      ps AS (SELECT doc_id, CAST(unnest(range(len(ws) - 4)) AS INT) AS pos, ws
             FROM pw WHERE len(ws) >= 5),
      sh AS (SELECT doc_id, pos,
                    concat_ws(' ', ws[pos+1], ws[pos+2], ws[pos+3],
                              ws[pos+4], ws[pos+5]) AS s
             FROM ps),
      csh AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
      nsh AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
      rare AS (SELECT s FROM csh GROUP BY s HAVING COUNT(*) <= 50),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.pos AS pa, a.pos - b.pos AS d
            FROM nsh a JOIN csh b USING (s)
            WHERE s IN (SELECT s FROM rare)),
      g AS (SELECT doc_a, doc_b, d, pa,
                   pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, d
                     ORDER BY pa) AS grp
            FROM m),
      runs AS (SELECT doc_a, doc_b, d, MIN(pa) AS sa,
                      CAST(COUNT(*) AS BIGINT) AS run
               FROM g GROUP BY doc_a, doc_b, d, grp)
      SELECT doc_a, doc_b, CAST(sa AS BIGINT) AS start_a,
             CAST(sa - d AS BIGINT) AS start_b,
             CAST(run + 4 AS BIGINT) AS span_tokens
      FROM runs WHERE run >= 4
      ORDER BY doc_a, doc_b, start_a, start_b""")),

    ("d20_minhash_recall", (s: SparkSession, d: String) => {
      val sample = t(s, d, "documents").filter(col("doc_id") < 1200)
      // the LSH pipeline's candidate/verify checkpoints and the exact
      // baseline's array materialization are independent — overlap
      // their jobs (guide §2.6)
      val (lshN, arr) = graft.core.Par.eval2(
        Dedup.minhashDup(sample, threshold = 0.5)
          .agg(count(lit(1)).as("n_lsh")),
        // spread + checkpoint: the nested-loop baseline streams one side
        // against the broadcast other — without the repartition the
        // stream side is the fixture's single input split and all 720k
        // pair intersects run in one task (31s measured; ~2s spread)
        Tables.spread(sample).select(col("doc_id"),
          array_sort(TextOps.wordShingles(col("text"), Dedup.ShingleSize))
            .as("sa"))
          .cpGuard())
      def nc = graft.functions.SortedIntersectCount(col("a.sa"), col("b.sa"))
      val exactN = arr.as("a")
        .join(arr.as("b"), col("a.doc_id") < col("b.doc_id"))
        // both-empty pairs make the union size 0: the oracle's NaN
        // comparison excludes them; ANSI Spark would throw on the
        // division instead, so exclude them before dividing
        .filter(size(col("a.sa")) + size(col("b.sa")) > 0)
        .select((nc.cast("double") /
          (size(col("a.sa")) + size(col("b.sa")) - nc)).as("j"))
        .filter(col("j") >= 0.5)
        .agg(count(lit(1)).as("n_exact"))
      // n_lsh <= n_exact always (the LSH output is the verified subset
      // of true pairs), so a pair-free sample yields 0/1 = 0.0 under
      // the GREATEST guard — total at any sf, never a NaN or an ANSI
      // divide-by-zero, and n_exact = 0 is visible alongside
      exactN.crossJoin(lshN)
        .select(col("n_exact"), col("n_lsh"),
          (col("n_lsh").cast("double") /
            greatest(col("n_exact"), lit(1L)).cast("double")).as("recall"))
    }, Some {
      val sampled = minhashCtes.replace("FROM documents",
        "FROM (SELECT * FROM documents WHERE doc_id < 1200)")
      s"""
      WITH $sampled,
      lshn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM com
               WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
      sarr AS (SELECT doc_id, $shinglesSql AS sa FROM documents
               WHERE doc_id < 1200),
      exn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
              FROM sarr a JOIN sarr b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.sa, b.sa)) AS DOUBLE)
                    / (len(a.sa) + len(b.sa) - len(list_intersect(a.sa, b.sa)))
                    >= 0.5)
      SELECT n_exact, n_lsh,
             CAST(n_lsh AS DOUBLE) / CAST(GREATEST(n_exact, 1) AS DOUBLE) AS recall
      FROM exn CROSS JOIN lshn"""
    }),

    // asymmetric-containment recall measured in-engine (the d20 twin for
    // d19's directed small-in-large path) on the same FIXED 1200-doc
    // sample. The bottom-K probe with >= 2-hit agreement misses a true
    // containment pair with probability ~P[Binom(4, c) <= 1] — this
    // query turns that documented trade into an oracle-checked VALUE.
    // The verified asym output is by construction a subset of the exact
    // directed pairs (same string-shingle verification predicate), so
    // recall = n_asym / n_exact with no pair join; one undirected
    // all-pairs scan scores both directions.
    ("d21_containment_recall", (s: SparkSession, d: String) => {
      val sample = t(s, d, "documents").filter(col("doc_id") < 1200)
      // asym pipeline and exact-baseline arrays are independent eager
      // chains — overlap their jobs (guide §2.6, the d20 discipline)
      val (asymN, arr) = graft.core.Par.eval2(
        Dedup.containmentDupAsym(sample, threshold = 0.8,
            probeK = 4, maxBucket = Int.MaxValue)
          .agg(count(lit(1)).as("n_asym")),
        Tables.spread(sample).select(col("doc_id"),
          array_sort(TextOps.wordShingles(col("text"), Dedup.ShingleSize))
            .as("sa"))
          .cpGuard())
      def nc = graft.functions.SortedIntersectCount(col("a.sa"), col("b.sa"))
      val exactN = arr.as("a")
        .join(arr.as("b"), col("a.doc_id") < col("b.doc_id"))
        // empty-shingle docs can't pass 0.8 in either direction; dropping
        // them up front keeps both divisions ANSI-safe
        .filter(size(col("a.sa")) > 0 && size(col("b.sa")) > 0)
        .select(nc.as("n"),
          size(col("a.sa")).as("na"), size(col("b.sa")).as("nb"))
        .select(((col("n").cast("double") / col("na") >= 0.8).cast("long") +
                 (col("n").cast("double") / col("nb") >= 0.8).cast("long"))
          .as("hits"))
        .agg(coalesce(sum(col("hits")), lit(0L)).as("n_exact"))
      exactN.crossJoin(asymN)
        .select(col("n_exact"), col("n_asym"),
          (col("n_asym").cast("double") /
            greatest(col("n_exact"), lit(1L)).cast("double")).as("recall"))
    }, Some(s"""
      WITH sdocs AS (SELECT * FROM documents WHERE doc_id < 1200),
      sh0 AS (SELECT DISTINCT doc_id, s FROM
                (SELECT doc_id, unnest($shinglesSql) AS s FROM sdocs)),
      hh AS (SELECT DISTINCT doc_id, ${Hashing.h32Sql("s")} AS h FROM sh0),
      probe AS (SELECT doc_id AS doc_a, h FROM
                  (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY h) AS rn FROM hh)
                WHERE rn <= 4),
      cand AS (SELECT p.doc_a, x.doc_id AS doc_b
               FROM probe p JOIN hh x ON x.h = p.h AND x.doc_id <> p.doc_a
               GROUP BY p.doc_a, x.doc_id HAVING COUNT(*) >= 2),
      arr AS (SELECT doc_id, $shinglesSql AS sa FROM sdocs),
      com AS (SELECT doc_a, doc_b,
                     CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                     CAST(len(a.sa) AS INT) AS na
              FROM cand JOIN arr a ON a.doc_id = doc_a
                        JOIN arr b ON b.doc_id = doc_b),
      asymn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_asym FROM com
                WHERE CAST(n_common AS DOUBLE) / na >= 0.8),
      exn AS (SELECT CAST(COALESCE(SUM(
                (CASE WHEN CAST(len(list_intersect(a.sa, b.sa)) AS DOUBLE)
                           / len(a.sa) >= 0.8 THEN 1 ELSE 0 END) +
                (CASE WHEN CAST(len(list_intersect(a.sa, b.sa)) AS DOUBLE)
                           / len(b.sa) >= 0.8 THEN 1 ELSE 0 END)), 0) AS BIGINT)
                AS n_exact
              FROM arr a JOIN arr b ON a.doc_id < b.doc_id
              WHERE len(a.sa) > 0 AND len(b.sa) > 0)
      SELECT n_exact, n_asym,
             CAST(n_asym AS DOUBLE) / CAST(GREATEST(n_exact, 1) AS DOUBLE) AS recall
      FROM exn CROSS JOIN asymn""")),

    ("d07_cosine_dup", (s: SparkSession, d: String) =>
      Similarity.cosineDupPairs(t(s, d, "embeddings"), threshold = 0.4),
      Some(cosineDupOracle)),

    // bucketed variant of d07: LSH-collision candidates + exact verify —
    // the embedding near-dup shape that scales (no nested-loop join)
    ("d11_cosine_lsh_dup", (s: SparkSession, d: String) =>
      Similarity.lshCosineDupPairs(t(s, d, "embeddings"), nPlanes = 8, threshold = 0.4),
      Some(lshCosineDupOracle)),

    // banded (Bands x Rows) variant of d11 at the same 8 total planes:
    // any-band collision => candidate superset of the single-table join
    ("d12_cosine_banded_lsh_dup", (s: SparkSession, d: String) =>
      Similarity.bandedCosineDupPairs(t(s, d, "embeddings"),
        nBands = 2, rowsPerBand = 4, threshold = 0.4),
      Some(bandedCosineDupOracle)),

    // incremental embedding near-dup: fresh batch (odd ids) bucketed
    // against the corpus's (even ids) persisted hyperplane buckets —
    // the dense twin of c04/c05
    ("c06_incremental_cosine_dedup", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      Similarity.lshCosineDupAgainst(
        embs.filter(col("vec_id") % 2 === 0),
        embs.filter(col("vec_id") % 2 === 1),
        nPlanes = 8, threshold = 0.3)
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
      pl0 AS (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT 8),
      pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
             FROM pl0),
      b AS (SELECT v.vec_id,
              CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                       THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings v CROSS JOIN pl p GROUP BY v.vec_id),
      eb AS (SELECT e.vec_id, embedding, nrm, bucket FROM e JOIN b USING (vec_id))
      SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.bucket AS bucket,
             ${dotS("a.embedding", "c.embedding")} / (a.nrm * c.nrm) AS cosine
      FROM eb a JOIN eb c ON a.bucket = c.bucket
        AND a.vec_id % 2 = 1 AND c.vec_id % 2 = 0
      WHERE ${dotS("a.embedding", "c.embedding")} / (a.nrm * c.nrm) >= 0.3
      ORDER BY vec_a, vec_b""")),

    // ---- Rocchio pseudo-relevance feedback: round-1 exact top-k ->
    // rank-ordered feedback-centroid fold -> re-ranked round-2 top-k.
    // The oracle replays the identical vector folds with list_reduce
    // (zero-init, rank order), so the expanded-query cosines match
    // bit-for-bit ---------------------------------------------------
    ("s30_rocchio_expand", (s: SparkSession, d: String) =>
      Similarity.rocchioExpand(t(s, d, "embeddings"), nQueries = 5, k = 10),
      Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                        ${normS("embedding")} AS q_norm
                 FROM embeddings WHERE vec_id < 5),
      t AS (SELECT vec_id AS t_id, embedding AS t_emb,
                   ${normS("embedding")} AS t_norm
            FROM embeddings WHERE vec_id >= 5),
      s1 AS (SELECT q_id, t_id, t_emb, q_emb,
                    ${dotS("q_emb", "t_emb")} / (q_norm * t_norm) AS cosine
             FROM t CROSS JOIN q),
      r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cosine DESC, t_id) AS rn FROM s1),
      fbv AS (SELECT q_id,
                list(list_transform(t_emb, x -> CAST(x AS DOUBLE))
                     ORDER BY rn) AS vs,
                first(q_emb) AS q_emb
              FROM r1 WHERE rn <= 10 GROUP BY q_id),
      fb AS (SELECT q_id, q_emb,
               list_reduce(list_prepend(
                   list_transform(range(len(q_emb)), i -> CAST(0.0 AS DOUBLE)),
                   vs),
                 (acc, v) -> list_transform(range(len(acc)),
                   i -> acc[i+1] + v[i+1])) AS fsum
             FROM fbv),
      qe AS (SELECT q_id,
               list_transform(range(len(q_emb)), i ->
                 CAST(q_emb[i+1] AS DOUBLE) * CAST(0.5 AS DOUBLE)
                 + (fsum[i+1] * CAST(0.5 AS DOUBLE)) / CAST(10.0 AS DOUBLE))
                 AS q_exp
             FROM fb),
      qn AS (SELECT q_id, q_exp,
               sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(len(q_exp)),
                   i -> q_exp[i+1] * q_exp[i+1])),
                 (a, b) -> a + b)) AS qx_norm
             FROM qe),
      s2 AS (SELECT qn.q_id, t.t_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(len(q_exp)),
                   i -> q_exp[i+1] * CAST(t_emb[i+1] AS DOUBLE))),
                 (a, b) -> a + b) / (qx_norm * t_norm) AS cosine2
             FROM t CROSS JOIN qn),
      r2 AS (SELECT q_id, t_id, cosine2,
               ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine2 DESC, t_id) AS rn FROM s2)
      SELECT q_id AS query_id, t_id AS neighbor_id, cosine2,
             CAST(rn AS INT) AS rn
      FROM r2 WHERE rn <= 10 ORDER BY query_id, rn""")),

    // ---- hybrid retrieval: reciprocal-rank fusion of the dense
    // cosine ranking (s01 shape) and the sparse BM25 ranking (t16
    // shape). RRF consumes only ranks, so the fused score is an exact
    // BIGINT sum of floor(2^40/(60+rank)) terms; the oracle rebuilds
    // BOTH rankings and fuses with the identical integer arithmetic --
    ("s31_rrf_fusion", (s: SparkSession, d: String) =>
      Similarity.hybridRrfTopK(t(s, d, "documents"), t(s, d, "embeddings"),
        nQueries = 5, depth = 10, k = 8),
      Some(s"""
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
      bagg AS (SELECT q_id, t_id,
                 CAST(SUM(CAST(floor(term_score * CAST(1099511627776 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS bs
               FROM ts GROUP BY 1, 2),
      bm AS (SELECT q_id, t_id, rn FROM
               (SELECT q_id, t_id,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY bs DESC, t_id) AS rn
                FROM bagg) z WHERE rn <= 10),
      e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
      sc AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                    ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
             FROM e q JOIN e t ON q.vec_id < 5 AND t.vec_id >= 5),
      dn AS (SELECT qid, tid, rn FROM
               (SELECT qid, tid,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, tid) AS rn
                FROM sc) z WHERE rn <= 10),
      fused AS (SELECT COALESCE(d.qid, b.q_id) AS query_id,
                       COALESCE(d.tid, b.t_id) AS neighbor_id,
                  COALESCE(CAST(floor(CAST(1099511627776 AS DOUBLE)
                    / (CAST(60 AS DOUBLE) + CAST(d.rn AS DOUBLE))) AS BIGINT), 0)
                  + COALESCE(CAST(floor(CAST(1099511627776 AS DOUBLE)
                    / (CAST(60 AS DOUBLE) + CAST(b.rn AS DOUBLE))) AS BIGINT), 0)
                  AS rrf_score
                FROM dn d FULL OUTER JOIN bm b
                  ON d.qid = b.q_id AND d.tid = b.t_id)
      SELECT query_id, neighbor_id, rrf_score, CAST(rn AS INT) AS rn FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY rrf_score DESC, neighbor_id) AS rn FROM fused) z
      WHERE rn <= 8 ORDER BY query_id, rn""")),

    // ---- greedy k-center coreset (Gonzalez farthest-point): 4
    // rounds of max-over-points min-to-centers squared L2; the oracle
    // unrolls the identical rounds with MATERIALIZED center sets and
    // the same one-association-order distance expression ------------
    ("s32_kcenter_coreset", (s: SparkSession, d: String) =>
      Similarity.kcenterCoreset(t(s, d, "embeddings"), k = 4),
      Some {
        def d2(v: String, c: String) =
          s"(${dotS(s"$v.embedding", s"$v.embedding")} " +
            s"- CAST(2 AS DOUBLE) * ${dotS(s"$v.embedding", s"$c.embedding")} " +
            s"+ ${dotS(s"$c.embedding", s"$c.embedding")})"
        def roundCtes(r: Int): String = {
          val prev = s"c${r - 1}"
          s"""m$r AS (SELECT v.vec_id, MIN(${d2("v", "c")}) AS d2
               FROM e v CROSS JOIN $prev c
               WHERE v.vec_id NOT IN (SELECT vec_id FROM $prev)
               GROUP BY 1),
          p$r AS MATERIALIZED (SELECT vec_id, d2 FROM m$r
               ORDER BY d2 DESC, vec_id LIMIT 1),
          c$r AS MATERIALIZED (SELECT vec_id, embedding FROM e
               WHERE vec_id IN (SELECT vec_id FROM $prev
                                UNION SELECT vec_id FROM p$r))"""
        }
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        c1 AS MATERIALIZED (SELECT vec_id, embedding FROM e
             ORDER BY vec_id LIMIT 1),
        ${roundCtes(2)},
        ${roundCtes(3)},
        ${roundCtes(4)}
        SELECT CAST(1 AS INT) AS round, (SELECT vec_id FROM c1) AS vec_id,
               CAST(NULL AS DOUBLE) AS radius_d2
        UNION ALL SELECT 2, vec_id, d2 FROM p2
        UNION ALL SELECT 3, vec_id, d2 FROM p3
        UNION ALL SELECT 4, vec_id, d2 FROM p4
        ORDER BY round"""
      }),

    // ---- silhouette audit of the label partition under squared L2:
    // pairwise sums collapsed to per-cluster moments (n, S, Σ||y||²)
    // via Σ||x−y||² = n||x||² − 2⟨x,S⟩ + Σ||y||² — never a point-pair
    // join; inputs floor-quantized at 2^10 so all moments are BIGINT,
    // three fixed-order IEEE divisions per point, floor(s·2^40) makes
    // the per-label mean aggregation-order-free -----------------------
    ("s33_silhouette", (s: SparkSession, d: String) =>
      Similarity.silhouette(t(s, d, "embeddings")),
      Some("""
      WITH f AS (SELECT vec_id, label,
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS f
            FROM embeddings),
      pt AS (SELECT vec_id, label, f,
               CAST(list_sum(list_transform(f, x -> x * x)) AS BIGINT) AS ss
             FROM f),
      d AS (SELECT vec_id, label AS own,
              generate_subscripts(f, 1) AS pos, unnest(f) AS fx
            FROM pt),
      cd AS (SELECT own AS label, pos, CAST(SUM(fx) AS BIGINT) AS s_pos
             FROM d GROUP BY 1, 2),
      cs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ss) AS BIGINT) AS ssum
             FROM pt GROUP BY 1),
      dots AS (SELECT d.vec_id, d.own, cd.label,
                 CAST(SUM(d.fx * cd.s_pos) AS BIGINT) AS dot
               FROM d JOIN cd ON cd.pos = d.pos GROUP BY 1, 2, 3),
      dd AS (SELECT dots.vec_id, dots.own, dots.label, cs.n,
               cs.n * pt.ss - 2 * dots.dot + cs.ssum AS bigD
             FROM dots JOIN cs ON cs.label = dots.label
               JOIN pt ON pt.vec_id = dots.vec_id),
      ab AS (SELECT vec_id, own,
               MAX(CASE WHEN label = own THEN bigD END) AS aD,
               MAX(CASE WHEN label = own THEN n END) - 1 AS an,
               MIN(CASE WHEN label <> own THEN
                 CAST(bigD AS DOUBLE) / CAST(n AS DOUBLE) END) AS b
             FROM dd GROUP BY 1, 2),
      sq AS (SELECT vec_id, own,
               CASE WHEN an = 0 OR
                 GREATEST(CAST(aD AS DOUBLE) / CAST(an AS DOUBLE), b) = 0.0
               THEN 0
               ELSE CAST(floor(
                 (b - CAST(aD AS DOUBLE) / CAST(an AS DOUBLE))
                 / GREATEST(CAST(aD AS DOUBLE) / CAST(an AS DOUBLE), b)
                 * 1099511627776.0) AS BIGINT)
               END AS sqv
             FROM ab)
      SELECT own AS label, CAST(COUNT(*) AS BIGINT) AS n_points,
             (CAST(SUM(sqv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
               / 1099511627776.0 AS mean_s
      FROM sq GROUP BY 1 ORDER BY 1""")),

    // ---- top principal direction by power iteration on the EXACT
    // integer centered scatter S = n·Σff^T − (Σf)(Σf)^T (s33's 2^10
    // quantization; cross-multiplied centering — no float mean). One
    // partial-aggregable Gram pass over a per-vector d² fan-out, then
    // the iteration runs on the collected d×d matrix in BigInt (the
    // bounded-collect contract); renormalize each round to max-abs 512
    // by truncating division on the magnitude (= floor on nonneg,
    // portable). Oracle unrolls the identical rounds in HUGEINT ------
    ("s35_pca_power", (s: SparkSession, d: String) =>
      Similarity.pcaPower(t(s, d, "embeddings"), rounds = 6),
      Some {
        val iterCtes = (1 to 6).map { r =>
          s"""u$r AS MATERIALIZED (SELECT sc.i AS j, SUM(sc.sv * v${r - 1}.v) AS u
            FROM sc JOIN v${r - 1} ON v${r - 1}.j = sc.j GROUP BY 1),
      m$r AS (SELECT MAX(ABS(u)) AS mx FROM u$r),
      v$r AS MATERIALIZED (SELECT j,
            (CASE WHEN u < 0 THEN -1 ELSE 1 END)
              * ((ABS(u) * 512) // m$r.mx) AS v
          FROM u$r CROSS JOIN m$r)"""
        }.mkString(",\n      ")
        s"""
      WITH f AS (SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS f
            FROM embeddings),
      dd AS MATERIALIZED (SELECT vec_id, generate_subscripts(f, 1) AS pos,
              unnest(f) AS fx FROM f),
      nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM f),
      sm AS MATERIALIZED (SELECT pos, CAST(SUM(fx) AS HUGEINT) AS s
            FROM dd GROUP BY 1),
      g AS (SELECT a.pos AS i, b.pos AS j,
              CAST(SUM(a.fx * b.fx) AS HUGEINT) AS gg
            FROM dd a JOIN dd b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      sc AS MATERIALIZED (SELECT g.i, g.j, nn.n * g.gg - si.s * sj.s AS sv
            FROM g JOIN sm si ON si.pos = g.i
                   JOIN sm sj ON sj.pos = g.j
                   CROSS JOIN nn),
      v0 AS (SELECT pos AS j, CAST(512 AS HUGEINT) AS v FROM sm),
      $iterCtes,
      ray AS (SELECT SUM(va.v * sc.sv * vb.v) AS num
              FROM sc JOIN v6 va ON va.j = sc.i JOIN v6 vb ON vb.j = sc.j),
      den AS (SELECT SUM(v * v) AS vv FROM v6)
      SELECT CAST(v6.j - 1 AS INT) AS pos, CAST(v6.v AS BIGINT) AS v,
             CAST((ray.num * 1048576) // (den.vv * nn.n * nn.n) AS BIGINT)
               AS lambda_u20
      FROM v6 CROSS JOIN ray CROSS JOIN den CROSS JOIN nn
      ORDER BY pos"""
      }),

    // ---- graph-based ANN (NSW family): greedy beam search over an
    // exact 8-NN graph — multi-entry at the 8 lowest target ids, 4
    // rounds of expand-score-keep-8, final top-5 flagged vs the brute
    // baseline; the oracle unrolls the identical rounds (MATERIALIZED
    // CTEs — the g16 inlining lesson) -------------------------------
    // graph build is the LSH-banded equi-join (2 bands x 4 bits over
    // the 8-plane sign bucket) — no all-pairs stage anywhere; the
    // oracle is cap-blind, so requireUnpruned asserts the HotBuckets
    // short-circuit precondition (banded rows <= maxBucket) and fails
    // ATTRIBUTABLY on a fixture big enough to prune (the cap semantics
    // themselves are oracled by d31-d34)
    ("s34_nsw_search", (s: SparkSession, d: String) =>
      Similarity.nswSearchLsh(t(s, d, "embeddings"), nQueries = 10,
        nPlanes = 8, bandBits = 4, g = 8, beam = 8, rounds = 4, k = 5,
        requireUnpruned = true),
      Some {
        def cosQT = s"${dotS("q.q_emb", "t.t_emb")} / (q.q_norm * t.t_norm)"
        def roundCtes(r: Int): String =
          s"""c$r AS (SELECT DISTINCT b.q_id, ge.b_id AS t_id
               FROM b${r - 1} b JOIN ge ON ge.a_id = b.t_id),
          n$r AS (SELECT c.q_id, c.t_id, $cosQT AS cosine
               FROM c$r c JOIN q ON q.q_id = c.q_id
                 JOIN t ON t.t_id = c.t_id),
          s$r AS MATERIALIZED (SELECT DISTINCT * FROM
               (SELECT * FROM s${r - 1} UNION ALL SELECT * FROM n$r) u),
          b$r AS MATERIALIZED (SELECT q_id, t_id, cosine FROM
               (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY cosine DESC, t_id) AS rn FROM s$r) z
               WHERE rn <= 8)"""
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding,
               ${normS("embedding")} AS nrm FROM embeddings),
        t AS MATERIALIZED (SELECT vec_id AS t_id, embedding AS t_emb,
               nrm AS t_norm FROM e WHERE vec_id >= 10),
        q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb,
               nrm AS q_norm FROM e WHERE vec_id < 10),
        pl0 AS (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT 8),
        pl AS (SELECT embedding,
                 CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
               FROM pl0),
        bk AS (SELECT v.vec_id,
                 CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT)
                   AS bucket
               FROM embeddings v CROSS JOIN pl p
               WHERE v.vec_id >= 10 GROUP BY v.vec_id),
        bd AS MATERIALIZED (SELECT vec_id, bands.j AS band,
                 (bucket >> (bands.j * 4)) & 15 AS bkey
               FROM bk CROSS JOIN (SELECT UNNEST([0, 1]) AS j) bands),
        cp AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
               FROM bd a JOIN bd b
                 ON a.band = b.band AND a.bkey = b.bkey
                AND a.vec_id <> b.vec_id),
        ge AS MATERIALIZED (SELECT a_id, b_id FROM
             (SELECT cp.a_id, cp.b_id,
                ROW_NUMBER() OVER (PARTITION BY cp.a_id ORDER BY
                  ${dotS("a.t_emb", "b.t_emb")} / (a.t_norm * b.t_norm)
                    DESC, cp.b_id) AS grn
              FROM cp JOIN t a ON a.t_id = cp.a_id
                      JOIN t b ON b.t_id = cp.b_id) z
             WHERE grn <= 8),
        en AS (SELECT t_id FROM t ORDER BY t_id LIMIT 8),
        s0 AS MATERIALIZED (SELECT q.q_id, t.t_id, $cosQT AS cosine
             FROM q, en, t WHERE t.t_id = en.t_id),
        b0 AS (SELECT * FROM s0),
        ${roundCtes(1)},
        ${roundCtes(2)},
        ${roundCtes(3)},
        ${roundCtes(4)},
        ex AS (SELECT q_id, t_id FROM
             (SELECT q.q_id, t.t_id,
                ROW_NUMBER() OVER (PARTITION BY q.q_id
                  ORDER BY $cosQT DESC, t.t_id) AS rn
              FROM q CROSS JOIN t) z WHERE rn <= 5)
        SELECT f.q_id AS query_id, f.t_id AS neighbor_id, f.cosine,
               CAST(f.rn AS INT) AS rn,
               (ex.t_id IS NOT NULL) AS in_exact
        FROM (SELECT q_id, t_id, cosine,
                ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY cosine DESC, t_id) AS rn
              FROM s4) f
        LEFT JOIN ex ON ex.q_id = f.q_id AND ex.t_id = f.t_id
        WHERE f.rn <= 5
        ORDER BY query_id, rn"""
      }),

    // NN-descent refinement audit over the s34 banded build (Dong et
    // al. WWW'11): one neighbor-of-neighbor round re-scored exact and
    // cut per-node top-g, UNIONED with the banded seed edges (pure
    // descent converges to the hard-to-navigate kNN graph and LOSES
    // recall — see nswRefineAudit's scaladoc), then the SAME beam
    // search over both graphs; output = exact-integer recall@k
    // numerators plus the monotonicity verdict. The oracle replays
    // both graph builds and both beam unrolls value-for-value --------
    ("s40_nsw_refine_audit", (s: SparkSession, d: String) =>
      Similarity.nswRefineAudit(t(s, d, "embeddings"), nQueries = 10,
        nPlanes = 8, bandBits = 4, g = 8, beam = 8, rounds = 4, k = 5,
        refineRounds = 1, requireUnpruned = true),
      Some {
        def cosQT = s"${dotS("q.q_emb", "t.t_emb")} / (q.q_norm * t.t_norm)"
        // one beam round over edge table `et`, CTE prefix `p`
        def roundCtes(p: String, et: String, r: Int): String =
          s"""${p}c$r AS (SELECT DISTINCT b.q_id, ge.b_id AS t_id
               FROM ${p}b${r - 1} b JOIN $et ge ON ge.a_id = b.t_id),
          ${p}n$r AS (SELECT c.q_id, c.t_id, $cosQT AS cosine
               FROM ${p}c$r c JOIN q ON q.q_id = c.q_id
                 JOIN t ON t.t_id = c.t_id),
          ${p}s$r AS MATERIALIZED (SELECT DISTINCT * FROM
               (SELECT * FROM ${p}s${r - 1} UNION ALL SELECT * FROM ${p}n$r) u),
          ${p}b$r AS MATERIALIZED (SELECT q_id, t_id, cosine FROM
               (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY cosine DESC, t_id) AS rn FROM ${p}s$r) z
               WHERE rn <= 8)"""
        def beamOf(p: String, et: String): String =
          s"""${p}s0 AS (SELECT * FROM s0), ${p}b0 AS (SELECT * FROM s0),
          ${roundCtes(p, et, 1)},
          ${roundCtes(p, et, 2)},
          ${roundCtes(p, et, 3)},
          ${roundCtes(p, et, 4)},
          ${p}f AS (SELECT q_id, t_id FROM
               (SELECT q_id, t_id, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY cosine DESC, t_id) AS rn FROM ${p}s4) z
               WHERE rn <= 5)"""
        s"""
        WITH e AS MATERIALIZED (SELECT vec_id, embedding,
               ${normS("embedding")} AS nrm FROM embeddings),
        t AS MATERIALIZED (SELECT vec_id AS t_id, embedding AS t_emb,
               nrm AS t_norm FROM e WHERE vec_id >= 10),
        q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb,
               nrm AS q_norm FROM e WHERE vec_id < 10),
        pl0 AS (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT 8),
        pl AS (SELECT embedding,
                 CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
               FROM pl0),
        bk AS (SELECT v.vec_id,
                 CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                   THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT)
                   AS bucket
               FROM embeddings v CROSS JOIN pl p
               WHERE v.vec_id >= 10 GROUP BY v.vec_id),
        bd AS MATERIALIZED (SELECT vec_id, bands.j AS band,
                 (bucket >> (bands.j * 4)) & 15 AS bkey
               FROM bk CROSS JOIN (SELECT UNNEST([0, 1]) AS j) bands),
        cp AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
               FROM bd a JOIN bd b
                 ON a.band = b.band AND a.bkey = b.bkey
                AND a.vec_id <> b.vec_id),
        ge AS MATERIALIZED (SELECT a_id, b_id FROM
             (SELECT cp.a_id, cp.b_id,
                ROW_NUMBER() OVER (PARTITION BY cp.a_id ORDER BY
                  ${dotS("a.t_emb", "b.t_emb")} / (a.t_norm * b.t_norm)
                    DESC, cp.b_id) AS grn
              FROM cp JOIN t a ON a.t_id = cp.a_id
                      JOIN t b ON b.t_id = cp.b_id) z
             WHERE grn <= 8),
        rc AS (SELECT a_id, b_id FROM ge
               UNION
               SELECT x.a_id, y.b_id FROM ge x JOIN ge y ON x.b_id = y.a_id
               WHERE x.a_id <> y.b_id),
        gr0 AS (SELECT a_id, b_id FROM
             (SELECT rc.a_id, rc.b_id,
                ROW_NUMBER() OVER (PARTITION BY rc.a_id ORDER BY
                  ${dotS("a.t_emb", "b.t_emb")} / (a.t_norm * b.t_norm)
                    DESC, rc.b_id) AS grn
              FROM rc JOIN t a ON a.t_id = rc.a_id
                      JOIN t b ON b.t_id = rc.b_id) z
             WHERE grn <= 8),
        gr AS MATERIALIZED (SELECT a_id, b_id FROM gr0
             UNION SELECT a_id, b_id FROM ge),
        en AS (SELECT t_id FROM t ORDER BY t_id LIMIT 8),
        s0 AS MATERIALIZED (SELECT q.q_id, t.t_id, $cosQT AS cosine
             FROM q, en, t WHERE t.t_id = en.t_id),
        ${beamOf("xb", "ge")},
        ${beamOf("xr", "gr")},
        exk AS (SELECT q_id, t_id FROM
             (SELECT q.q_id, t.t_id,
                ROW_NUMBER() OVER (PARTITION BY q.q_id
                  ORDER BY $cosQT DESC, t.t_id) AS rn
              FROM q CROSS JOIN t) z WHERE rn <= 5),
        hb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM xbf JOIN exk USING (q_id, t_id)),
        hr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
               FROM xrf JOIN exk USING (q_id, t_id)),
        nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM xbf)
        SELECT hb.n AS hits_banded, hr.n AS hits_refined,
               nr.n AS n_rows, hr.n >= hb.n AS refined_ge_banded
        FROM hb, hr, nr"""
      }),

    ("s01_ann_brute_topk", (s: SparkSession, d: String) =>
      Similarity.bruteForceTopK(t(s, d, "embeddings"), nQueries = 10, k = 5),
      Some(annTopkOracle)),

    ("s02_ann_lsh_topk", (s: SparkSession, d: String) =>
      Similarity.lshTopK(t(s, d, "embeddings"), nPlanes = 8, nQueries = 10, k = 3),
      Some(annLshOracle)),

    // same rows as s01, different physical strategy: typed TopKAggregator
    // with map-side partial top-k instead of a window over all candidates
    ("s03_ann_topk_agg", (s: SparkSession, d: String) =>
      Similarity.bruteForceTopKAgg(t(s, d, "embeddings"), nQueries = 10, k = 5),
      Some(annTopkOracle)),

    // coarse-quantizer ANN: the IVF cell structure next to s02's LSH
    ("s06_ann_ivf_topk", (s: SparkSession, d: String) =>
      Similarity.ivfTopK(t(s, d, "embeddings"),
        nCentroids = 16, nProbe = 2, nQueries = 10, k = 5),
      Some(annIvfOracle)),

    // incremental IVF index maintenance: build the persisted index
    // over the first 300 vectors, APPEND the remaining 200 under the
    // FROZEN coarse centroids (insertInto through the catalog bucket
    // spec — probes keep the zero-Exchange corpus side), then serve.
    // Centroids are an order statistic of the lowest target ids, so
    // append-then-probe is bit-identical to a full rebuild — gated by
    // the SAME oracle as live s06 -------------------------------------
    ("s25_ivf_index_append", (s: SparkSession, d: String) => {
      val table = "graft_ivf_idx_append_q"
      s.sql(s"DROP TABLE IF EXISTS $table")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + s"/$table")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      val embs = t(s, d, "embeddings")
      val original = embs.filter(col("vec_id") < 300)
      Similarity.persistIvfIndex(original, nCentroids = 16, nQueries = 10,
        table = table, buckets = 8)
      Similarity.appendIvfIndex(s, table, original,
        embs.filter(col("vec_id") >= 300), nCentroids = 16, nQueries = 10)
      Similarity.ivfTopKFromIndex(s, table, embs, nCentroids = 16,
        nProbe = 2, nQueries = 10, k = 5)
    }, Some(annIvfOracle)),

    // hard-negative mining (DPR-style contrastive training data): for
    // each query, the top-5 most-similar vectors of a DIFFERENT class
    // label — the label inequality drops same-class candidates before
    // any distance math, the map-side TopKAggregator bounds the
    // shuffle at queries x k rows, and the mined negative's own label
    // re-attaches via a broadcast equi-join of the tiny result
    ("s26_hard_negatives", (s: SparkSession, d: String) =>
      Similarity.hardNegatives(t(s, d, "embeddings"), nQueries = 10, k = 5),
      Some(s"""
      WITH e AS (SELECT vec_id, embedding, label,
                        ${normS("embedding")} AS nrm FROM embeddings),
      sc AS (SELECT q.vec_id AS qid, q.label AS q_label,
                    t.vec_id AS tid, t.label AS t_label,
                    ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
             FROM e q JOIN e t
               ON q.vec_id < 10 AND t.vec_id >= 10 AND t.label <> q.label)
      SELECT qid AS query_id, q_label, tid AS neighbor_id,
             t_label AS neighbor_label, cosine, rn
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, tid) AS INT) AS rn FROM sc) z
      WHERE rn <= 5 ORDER BY query_id, rn""")),

    // late-interaction (ColBERT MaxSim) retrieval: docs = 4-token
    // vector sets, score = sum over query tokens of max target-token
    // cosine; per-token maxes exact doubles, outer sum 2^40 fixed
    // point (aggregation-order-free)
    ("s29_late_interaction", (s: SparkSession, d: String) =>
      Similarity.lateInteractionTopK(t(s, d, "embeddings"),
        tokensPerDoc = 4, nQueries = 2, k = 5),
      Some(s"""
      WITH tk AS (SELECT vec_id // 4 AS doc, vec_id % 4 AS tok, embedding,
                         ${normS("embedding")} AS nrm
                  FROM embeddings),
      sc AS (SELECT q.doc AS qd, t.doc AS td, q.tok,
                    MAX(${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm))
                      AS mc
             FROM tk q JOIN tk t ON q.doc < 2 AND q.doc <> t.doc
             GROUP BY 1, 2, 3),
      ms AS (SELECT qd, td,
                    CAST(SUM(CAST(FLOOR(mc * 1099511627776) AS BIGINT))
                      AS BIGINT) AS maxsim_fp
             FROM sc GROUP BY 1, 2)
      SELECT qd AS query_doc, td AS target_doc, maxsim_fp, rn
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qd
              ORDER BY maxsim_fp DESC, td) AS INT) AS rn FROM ms) z
      WHERE rn <= 5 ORDER BY query_doc, rn""")),

    // embedding distribution drift between two snapshots (even/odd
    // vec_id halves): per-dim means in exact 2^20 fixed point —
    // integer sums (never order-dependent float sums), single exact
    // divisions at the end
    ("s28_embedding_drift", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      Similarity.embeddingDrift(
        embs.filter(col("vec_id") % 2 === 0),
        embs.filter(col("vec_id") % 2 === 1))
    }, Some {
      def side(tag: String, par: Int) = s"""
      x$tag AS (SELECT CAST(i AS INT) AS dim,
                CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1048576) AS BIGINT) AS fx
             FROM (SELECT embedding FROM embeddings WHERE vec_id % 2 = $par) e,
                  unnest(generate_series(0, CAST(len(embedding) - 1 AS BIGINT))) AS t(i)),
      g$tag AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_$tag,
                       CAST(SUM(fx) AS BIGINT) AS sum_fp_$tag
                FROM x$tag GROUP BY 1)"""
      s"""
      WITH ${side("a", 0)}, ${side("b", 1)}
      SELECT dim, n_a, n_b, sum_fp_a, sum_fp_b,
             CAST(sum_fp_a AS DOUBLE) / n_a / 1048576
               - CAST(sum_fp_b AS DOUBLE) / n_b / 1048576 AS mean_delta
      FROM ga JOIN gb USING (dim) ORDER BY dim"""
    }),

    // DBSCAN-style density clustering on the cosine graph: core =
    // >= 5 neighbors at cosine >= 0.3, clusters = two-phase CC over
    // core-core edges, border = min core-neighbor cluster, else noise.
    // The oracle recomputes all of it from the brute-force pair list
    // with the d09 recursive-CTE closure — roles AND labels exact
    ("s27_dbscan", (s: SparkSession, d: String) =>
      Similarity.dbscanLite(t(s, d, "embeddings"),
        threshold = 0.3, minPts = 5),
      Some(s"""
      WITH RECURSIVE e AS (SELECT vec_id, embedding,
                                  ${normS("embedding")} AS nrm FROM embeddings),
      p AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM e a JOIN e b
            ON a.vec_id <> b.vec_id
            WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.3),
      core AS (SELECT va AS vec_id FROM p GROUP BY va HAVING COUNT(*) >= 5),
      ce AS (SELECT p.va AS src, p.vb AS dst FROM p
             WHERE p.va IN (SELECT vec_id FROM core)
               AND p.vb IN (SELECT vec_id FROM core)),
      reach(src, dst) AS (
        (SELECT src, dst FROM ce UNION SELECT vec_id, vec_id FROM core)
        UNION
        SELECT r.src, c.dst FROM reach r JOIN ce c ON r.dst = c.src),
      cl AS (SELECT src AS vec_id, MIN(dst) AS cluster FROM reach GROUP BY src),
      border AS (SELECT p.va AS vec_id, MIN(cl.cluster) AS cluster
                 FROM p JOIN cl ON p.vb = cl.vec_id
                 WHERE p.va NOT IN (SELECT vec_id FROM core)
                 GROUP BY 1)
      SELECT em.vec_id,
             CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
                  WHEN border.vec_id IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role,
             COALESCE(cl.cluster, border.cluster) AS cluster
      FROM embeddings em
      LEFT JOIN cl USING (vec_id)
      LEFT JOIN border USING (vec_id)
      ORDER BY vec_id""")),

    // s27 with LSH-collision candidate pairs instead of the exact
    // all-pairs baseline — the DBSCAN shape that survives 100 TB
    // (bucket equi-join candidates, zero nested-loop anywhere,
    // including behind the checkpoint). The oracle models the
    // 8-hyperplane bucketing itself (d11's convention), so the
    // density/CC/border semantics OVER the candidate graph are exact
    ("s27b_dbscan_lsh", (s: SparkSession, d: String) =>
      Similarity.dbscanLsh(t(s, d, "embeddings"), nPlanes = 8,
        threshold = 0.3, minPts = 5),
      Some(s"""
      WITH RECURSIVE e AS (SELECT vec_id, embedding,
                                  ${normS("embedding")} AS nrm FROM embeddings),
      pl0 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8),
      pl AS (SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j
             FROM pl0),
      b AS (SELECT v.vec_id,
                   CAST(SUM(CASE WHEN ${dotS("v.embedding", "p.embedding")} > 0
                            THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings v CROSS JOIN pl p GROUP BY v.vec_id),
      eb AS (SELECT e.vec_id, embedding, nrm, bucket FROM e JOIN b USING (vec_id)),
      p AS (SELECT a.vec_id AS va, c.vec_id AS vb FROM eb a JOIN eb c
            ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
            WHERE ${dotS("a.embedding", "c.embedding")} / (a.nrm * c.nrm) >= 0.3),
      core AS (SELECT va AS vec_id FROM p GROUP BY va HAVING COUNT(*) >= 5),
      ce AS (SELECT p.va AS src, p.vb AS dst FROM p
             WHERE p.va IN (SELECT vec_id FROM core)
               AND p.vb IN (SELECT vec_id FROM core)),
      reach(src, dst) AS (
        (SELECT src, dst FROM ce UNION SELECT vec_id, vec_id FROM core)
        UNION
        SELECT r.src, c.dst FROM reach r JOIN ce c ON r.dst = c.src),
      cl AS (SELECT src AS vec_id, MIN(dst) AS cluster FROM reach GROUP BY src),
      border AS (SELECT p.va AS vec_id, MIN(cl.cluster) AS cluster
                 FROM p JOIN cl ON p.vb = cl.vec_id
                 WHERE p.va NOT IN (SELECT vec_id FROM core)
                 GROUP BY 1)
      SELECT em.vec_id,
             CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
                  WHEN border.vec_id IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role,
             COALESCE(cl.cluster, border.cluster) AS cluster
      FROM embeddings em
      LEFT JOIN cl USING (vec_id)
      LEFT JOIN border USING (vec_id)
      ORDER BY vec_id""")),

    // filtered IVF: s18's metadata predicate composed with the cell
    // probe — the index is built once over the full corpus, the
    // allowed-id semi-join prunes candidates between cell assignment
    // and exact scoring (the production filtered-ANN shape)
    ("s19_filtered_ivf", (s: SparkSession, d: String) => {
      val allowed = t(s, d, "documents").filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Similarity.ivfTopK(t(s, d, "embeddings"),
        nCentroids = 16, nProbe = 2, nQueries = 10, k = 5,
        allowed = Some(allowed))
    }, Some(annIvfOracle.replace(
      "FROM qp JOIN ta USING (cell))",
      "FROM qp JOIN ta USING (cell) " +
        "WHERE t_id IN (SELECT doc_id FROM documents WHERE lang = 'en'))"))),

    // recall@5 of the LSH index against the exact baseline — the ANN
    // quality measurement, in-engine (both sides are exact-cosine
    // rankings, so even the recall fractions verify value-for-value)
    // truncated-dimension retrieval audit (the Matryoshka/dim-pruning
    // trade): recall@5 of brute search on the first 16 of 64 dims vs
    // the full-dimension baseline — the measurement that justifies (or
    // forbids) storing short embedding prefixes at 4x density
    ("s16_truncated_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val full = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val trunc = Similarity.bruteForceTopK(
          embs.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
          nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      full.join(trunc, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_full"), count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_full").cast("double"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS ($annTopkOracle),
      te AS (SELECT vec_id, list_slice(embedding, 1, 16) AS temb FROM embeddings),
      e2 AS (SELECT vec_id, temb, ${normS("temb")} AS nrm FROM te),
      sc2 AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                     ${dotS("q.temb", "t.temb")} / (q.nrm * t.nrm) AS cosine
              FROM e2 q JOIN e2 t ON q.vec_id < 10 AND t.vec_id >= 10),
      tr AS (SELECT qid AS query_id, tid AS neighbor_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, tid) AS rn FROM sc2) z
             WHERE rn <= 5)
      SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(COUNT(tr.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(tr.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM b LEFT JOIN tr
        ON b.query_id = tr.query_id AND b.neighbor_id = tr.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),

    // JL ±1 random projection to the SAME 16 dims as s16's prefix
    // truncation, then the identical recall@5 audit — measures, rather
    // than assumes, whether a random projection preserves neighborhoods
    // better than dropping 48 of 64 coordinates at equal storage cost
    // (on this near-isotropic fixture BOTH collapse toward chance —
    // which is precisely the go/no-go evidence the audit exists to
    // produce before anyone ships 4x-denser short vectors)
    ("s17_jl_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val full = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val proj = Similarity.bruteForceTopK(Similarity.jlProject(embs),
          nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      full.join(proj, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_full"), count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_full").cast("double"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS ($annTopkOracle),
      pe AS (SELECT vec_id, ${Similarity.jlProjectSql("embedding")} AS pemb
             FROM embeddings),
      e2 AS (SELECT vec_id, pemb, ${normS("pemb")} AS nrm FROM pe),
      sc2 AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                     ${dotS("q.pemb", "t.pemb")} / (q.nrm * t.nrm) AS cosine
              FROM e2 q JOIN e2 t ON q.vec_id < 10 AND t.vec_id >= 10),
      pr AS (SELECT qid AS query_id, tid AS neighbor_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, tid) AS rn FROM sc2) z
             WHERE rn <= 5)
      SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(COUNT(pr.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(pr.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM b LEFT JOIN pr
        ON b.query_id = pr.query_id AND b.neighbor_id = pr.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),

    // MMR diversified re-ranking: 5 picks from each query's top-20,
    // trading relevance against similarity-to-already-picked at
    // lambda = 0.5 — the selection loop that stops a batch from
    // filling with near-copies of one hit. Oracle = the same four
    // selection rounds unrolled; scores are fixed-order IEEE over the
    // portable cosine fold, so every pick and score verifies exactly
    ("s20_mmr_rerank", (s: SparkSession, d: String) =>
      Similarity.mmrTopK(t(s, d, "embeddings"), nQueries = 10,
        kCand = 20, kSel = 5),
      Some {
        val sim = s"${dotS("te.embedding", "se.embedding")} / (te.nrm * se.nrm)"
        val rounds = (2 to 5).map { r =>
          s"""ms$r AS (SELECT c.qid, c.tid, MAX($sim) AS maxsim
               FROM cand c JOIN selall${r - 1} sl ON c.qid = sl.qid
               JOIN e te ON te.vec_id = c.tid JOIN e se ON se.vec_id = sl.tid
               WHERE NOT EXISTS (SELECT 1 FROM selall${r - 1} x
                 WHERE x.qid = c.qid AND x.tid = c.tid)
               GROUP BY c.qid, c.tid),
          sel$r AS (SELECT qid, tid, $r AS rk, score FROM (
               SELECT m.qid, m.tid, 0.5 * c.rel - 0.5 * m.maxsim AS score,
                      ROW_NUMBER() OVER (PARTITION BY m.qid
                        ORDER BY 0.5 * c.rel - 0.5 * m.maxsim DESC, m.tid) AS rn
               FROM ms$r m JOIN cand c ON c.qid = m.qid AND c.tid = m.tid) z
             WHERE rn = 1),
          selall$r AS (SELECT * FROM selall${r - 1} UNION ALL SELECT * FROM sel$r)"""
        }.mkString(",\n      ")
        s"""
      WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
      sc AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                    ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
             FROM e q JOIN e t ON q.vec_id < 10 AND t.vec_id >= 10),
      cand AS (SELECT qid, tid, cosine AS rel
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY cosine DESC, tid) AS rn FROM sc) z
               WHERE rn <= 20),
      sel1 AS (SELECT qid, tid, 1 AS rk, rel AS score FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY rel DESC, tid) AS rn FROM cand) z WHERE rn = 1),
      selall1 AS (SELECT * FROM sel1),
      $rounds
      SELECT qid AS query_id, tid AS neighbor_id, CAST(rk AS INT) AS rk, score
      FROM selall5 ORDER BY query_id, rk"""
      }),

    // int8-retrieval audit: recall@5 of search over the quantized
    // reconstructions vs the float baseline — s08 shrinks storage 4x,
    // this measures what that costs retrieval (same audit frame as
    // s16/s17)
    ("s21_int8_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val full = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val recon = Similarity.bruteForceTopK(Similarity.int8Reconstruct(embs),
          nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      full.join(recon, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_full"), count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_full").cast("double"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS ($annTopkOracle),
      re AS (SELECT vec_id, ${Similarity.int8ReconstructSql("embedding")} AS remb
             FROM embeddings),
      e2 AS (SELECT vec_id, remb, ${normS("remb")} AS nrm FROM re),
      sc2 AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                     ${dotS("q.remb", "t.remb")} / (q.nrm * t.nrm) AS cosine
              FROM e2 q JOIN e2 t ON q.vec_id < 10 AND t.vec_id >= 10),
      rr AS (SELECT qid AS query_id, tid AS neighbor_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cosine DESC, tid) AS rn FROM sc2) z
             WHERE rn <= 5)
      SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(COUNT(rr.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(rr.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM b LEFT JOIN rr
        ON b.query_id = rr.query_id AND b.neighbor_id = rr.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),

    // binary-quantization retrieval audit: recall@5 of sign-bit
    // Hamming search (32x compression, xor+popcount — pure integers)
    // vs the float baseline; the third point on the s08/s21/s10-s12
    // storage/recall curve
    ("s37_sign_hamming_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val full = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val ham = Similarity.signHammingTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      full.join(ham, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_full"), count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_full").cast("double"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS ($annTopkOracle),
      sw AS (SELECT vec_id,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN embedding[i + 1] > 0
                 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS w0,
          CAST(list_sum(list_transform(range(32, 64), i ->
            CASE WHEN embedding[i + 1] > 0
                 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS BIGINT)
            AS w1
        FROM embeddings),
      hd AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
               CAST(bit_count(xor(q.w0, t.w0))
                 + bit_count(xor(q.w1, t.w1)) AS BIGINT) AS ham
             FROM sw q JOIN sw t ON q.vec_id < 10 AND t.vec_id >= 10),
      hh AS (SELECT qid AS query_id, tid AS neighbor_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY ham, tid) AS rn FROM hd) z
             WHERE rn <= 5)
      SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
             CAST(COUNT(hh.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(hh.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS recall
      FROM b LEFT JOIN hh
        ON b.query_id = hh.query_id AND b.neighbor_id = hh.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),

    // two-stage retrieval: s37's binary shortlist (Hamming top-20 over
    // the 32x-compressed codes) re-ranked by EXACT cosine on the full
    // vectors — the canonical production ANN shape; surviving
    // candidates score identically to brute force
    ("s38_sign_rerank", (s: SparkSession, d: String) =>
      Similarity.signHammingRerank(t(s, d, "embeddings"), nQueries = 10,
        kShort = 20, k = 5),
      Some(s"""
      WITH sw AS (SELECT vec_id,
          CAST(list_sum(list_transform(range(0, 32), i ->
            CASE WHEN embedding[i + 1] > 0
                 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS w0,
          CAST(list_sum(list_transform(range(32, 64), i ->
            CASE WHEN embedding[i + 1] > 0
                 THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS BIGINT)
            AS w1
        FROM embeddings),
      hd AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
               CAST(bit_count(xor(q.w0, t.w0))
                 + bit_count(xor(q.w1, t.w1)) AS BIGINT) AS ham
             FROM sw q JOIN sw t ON q.vec_id < 10 AND t.vec_id >= 10),
      sl AS (SELECT qid, tid
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY ham, tid) AS rn FROM hd) z
             WHERE rn <= 20),
      e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm
            FROM embeddings),
      sc AS (SELECT sl.qid AS query_id, sl.tid AS neighbor_id,
               ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm)
                 AS cosine
             FROM sl JOIN e q ON q.vec_id = sl.qid
             JOIN e t ON t.vec_id = sl.tid)
      SELECT query_id, neighbor_id, cosine, rn
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS INT) AS rn FROM sc) z
      WHERE rn <= 5 ORDER BY query_id, rn""")),

    // filtered vector search: the metadata predicate (doc lang = 'en')
    // semi-joins the target side BEFORE any distance math — filtered
    // ANN as a composition, never a post-filter that can starve k
    ("s18_filtered_ann", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val allowed = t(s, d, "documents").filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Similarity.filteredBruteTopK(embs, allowed, nQueries = 10, k = 5)
    }, Some(s"""
      WITH e AS (SELECT vec_id, embedding, ${normS("embedding")} AS nrm FROM embeddings),
      sc AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                    ${dotS("q.embedding", "t.embedding")} / (q.nrm * t.nrm) AS cosine
             FROM e q JOIN e t ON q.vec_id < 10 AND t.vec_id >= 10
             JOIN documents dd ON dd.doc_id = t.vec_id AND dd.lang = 'en')
      SELECT qid AS query_id, tid AS neighbor_id, cosine, rn
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine DESC, tid) AS INT) AS rn FROM sc) z
      WHERE rn <= 5 ORDER BY query_id, rn""")),

    ("s07_ann_lsh_recall", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val brute = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val lsh = Similarity.lshTopK(embs, nPlanes = 8, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
      brute.join(lsh, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_brute"),
          count(col("__hit")).as("n_hits"))
        .withColumn("recall",
          col("n_hits").cast("double") / col("n_brute").cast("double"))
        .orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS ($annTopkOracle),
      l AS (${annLshOracle.replace("rn <= 3", "rn <= 5")})
      SELECT b.query_id,
             CAST(COUNT(*) AS BIGINT) AS n_brute,
             CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
             CAST(COUNT(l.neighbor_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS recall
      FROM b LEFT JOIN l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY b.query_id ORDER BY b.query_id""")),

    // the IVF TUNING CURVE: total recall@5 at nProbe = 1, 2, 4 against
    // the exact baseline in one table — the probe-budget knob every
    // IVF deployment sets from exactly this measurement (recall rises
    // with probed cells, scan cost rises linearly). Each sweep point's
    // oracle nests the full IVF oracle at that nProbe verbatim, so the
    // curve inherits s06's exactness point by point
    ("s23_ivf_nprobe_sweep", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val brute = Similarity.bruteForceTopK(embs, nQueries = 10, k = 5)
        .select(col("query_id"), col("neighbor_id")).cpGuard()
      Seq(1, 2, 4).map { np =>
        val ivf = Similarity.ivfTopK(embs, nCentroids = 16, nProbe = np,
            nQueries = 10, k = 5)
          .select(col("query_id"), col("neighbor_id"), lit(1).as("__hit"))
        brute.join(ivf, Seq("query_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n_brute"), count(col("__hit")).as("n_hits"))
          .select(lit(np).as("nprobe"), col("n_brute"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_brute").cast("double"))
              .as("recall"))
      }.reduce(_ unionAll _).orderBy(col("nprobe"))
    }, Some {
      def sweepPoint(np: Int): String = s"""
        SELECT CAST($np AS INT) AS nprobe,
               CAST(COUNT(*) AS BIGINT) AS n_brute,
               CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hits,
               CAST(COUNT(l.neighbor_id) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS recall
        FROM (SELECT query_id, neighbor_id FROM ($annTopkOracle) bz) b
        LEFT JOIN (SELECT query_id, neighbor_id
                   FROM (${annIvfOracleN(np)}) lz) l
          ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id"""
      Seq(1, 2, 4).map(sweepPoint).mkString(
        "SELECT * FROM (", " UNION ALL ", ") s ORDER BY nprobe")
    }),

    // ---- MRR@10 retrieval eval: where does each query's TRUE nearest
    // neighbor (brute-force top-1, the s01 contract) land in the LSH
    // candidate ranking? Reciprocal ranks stay exact integers scaled
    // by 2520 = lcm(1..10); the corpus-wide MRR rides along as a ppm
    // column via the 1-row broadcast attach (c18 convention). The
    // rank-of-truth join is the same bounded query-set equi-join as
    // s07's recall ------------------------------------------------
    ("s36_mrr", (s: SparkSession, d: String) => {
      val embs = t(s, d, "embeddings")
      val truth = Similarity.bruteForceTopK(embs, nQueries = 10, k = 1)
        .select(col("query_id"), col("neighbor_id"))
      val cand = Similarity.lshTopK(embs, nPlanes = 8, nQueries = 10,
          k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rn"))
      val per = truth
        .join(cand, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("neighbor_id").as("truth_id"),
          col("rn").as("truth_rank"))
        .withColumn("rr_2520",
          coalesce(expr("2520 div truth_rank"), lit(0L)))
        .cpGuard() // read twice: per-query rows + the 1-row MRR total
      val tot = per.agg(count(lit(1)).as("nq"),
          sum(col("rr_2520")).as("srr"))
        .select(expr("CAST(srr * 1000000 div (2520 * nq) AS BIGINT)")
          .as("mrr_ppm"))
      per.crossJoin(broadcast(tot)).orderBy(col("query_id"))
    }, Some(s"""
      WITH b AS (${annTopkOracle.replace("rn <= 5", "rn <= 1")}),
      l AS (${annLshOracle.replace("rn <= 3", "rn <= 10")}),
      per AS (SELECT b.query_id, b.neighbor_id AS truth_id,
                     l.rn AS truth_rank,
                     CAST(COALESCE(2520 // l.rn, 0) AS BIGINT) AS rr_2520
              FROM b LEFT JOIN l
                ON b.query_id = l.query_id
               AND b.neighbor_id = l.neighbor_id),
      tot AS (SELECT CAST((SUM(rr_2520) * 1000000)
                // (2520 * COUNT(*)) AS BIGINT) AS mrr_ppm FROM per)
      SELECT per.query_id, per.truth_id, per.truth_rank, per.rr_2520,
             tot.mrr_ppm
      FROM per CROSS JOIN tot ORDER BY query_id""")),

    ("t01_langid", (s: SparkSession, d: String) =>
      TextAnalysis.langId(t(s, d, "documents")),
      Some(langidOracle)),

    // ---- language SEGMENTATION (code-switching audit): each doc gets
    // a deterministic 20-token tail in the language of its 5-mod class
    // (the t35/m14 plant discipline — the fixture's own texts carry
    // only English stopwords, so unplanted docs never switch), split
    // into 16-token windows, each window gets the t01 predictor, and
    // the per-doc audit counts windows, distinct languages, and
    // adjacent-window switches — the mixed-doc gate doc-level langid
    // is blind to ----------------------------------------------------
    ("t37_lang_segments", (s: SparkSession, d: String) => {
      val tails = TextAnalysis.stopwords.map { case (l, ws) =>
        l -> Seq.fill(4)(ws).flatten.mkString(" ")
      }
      val tailCase = tails.zipWithIndex.map { case ((_, tl), i) =>
        s"WHEN doc_id % 5 = $i THEN '$tl'"
      }.mkString("CASE ", " ", " END")
      val planted = t(s, d, "documents")
        .select(col("doc_id"),
          concat_ws(" ", col("text"), expr(tailCase)).as("text"))
      TextAnalysis.langSegments(planted, window = 16)
    }, Some(s"""
      WITH base AS (SELECT doc_id,
              concat_ws(' ', text, ${TextAnalysis.stopwords.zipWithIndex
                .map { case ((_, ws), i) =>
                  val tl = Seq.fill(4)(ws).flatten.mkString(" ")
                  s"WHEN doc_id % 5 = $i THEN '$tl'"
                }.mkString("CASE ", " ", " END")}) AS text
            FROM documents),
      w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM base),
      ch AS (SELECT doc_id, CAST(st // 16 AS INT) AS chunk_idx,
               ws[st + 1 : st + 16] AS cw
             FROM (SELECT doc_id, ws, unnest(range(0, len(ws), 16)) AS st
                   FROM w) z),
      sc AS (SELECT doc_id, chunk_idx, $langidChunkScoreCols FROM ch),
      pr AS (SELECT doc_id, chunk_idx, $langidCase AS pred FROM sc),
      lg AS (SELECT doc_id, pred, LAG(pred) OVER (PARTITION BY doc_id
               ORDER BY chunk_idx) AS prev FROM pr)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(DISTINCT pred) AS BIGINT) AS n_langs,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND pred <> prev
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
      FROM lg GROUP BY doc_id ORDER BY doc_id""")),

    // ---- seasonality-strength audit (MASE idea at the daily cycle):
    // 1h-lag vs 24h-lag absolute errors of the hourly load, lags as
    // integer-hour equi-self-joins (never a global window); ratio < 1e6
    // ppm means the daily rhythm beats last-hour persistence ----------
    ("w45_seasonal_strength", (s: SparkSession, d: String) =>
      TimeSeries.seasonalStrength(t(s, d, "events")),
      Some("""
      WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                        CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(COUNT(n.c) AS BIGINT) AS n_naive,
             CAST(COUNT(sn.c) AS BIGINT) AS n_seasonal,
             CAST(SUM(ABS(h.c - n.c)) AS BIGINT) AS sae_naive,
             CAST(SUM(ABS(h.c - sn.c)) AS BIGINT) AS sae_seasonal,
             CAST(CASE WHEN SUM(ABS(h.c - n.c)) > 0
                  THEN SUM(ABS(h.c - sn.c)) * 1000000
                       // SUM(ABS(h.c - n.c))
                  ELSE NULL END AS BIGINT) AS seasonal_ratio_ppm
      FROM h LEFT JOIN h n ON n.hr = h.hr - 1
             LEFT JOIN h sn ON sn.hr = h.hr - 24""")),

    // evaluation companion of t01: predicted-vs-labeled confusion matrix
    ("t14_langid_confusion", (s: SparkSession, d: String) =>
      TextAnalysis.langId(t(s, d, "documents"))
        .groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("labeled_lang"), col("predicted_lang")),
      Some(langidConfusionOracle)),

    ("t02_quality_score", (s: SparkSession, d: String) =>
      TextAnalysis.qualityScore(t(s, d, "documents")),
      Some(qualityOracle)),

    ("t03_token_counts", (s: SparkSession, d: String) =>
      TextAnalysis.tokenCounts(t(s, d, "documents")),
      Some(tokensOracle)),

    ("t04_fingerprint", (s: SparkSession, d: String) =>
      TextAnalysis.fingerprint(t(s, d, "documents")),
      Some(fingerprintOracle)),

    // corpus bigram extraction (word 2-grams with counts)
    ("t06_bigrams", (s: SparkSession, d: String) => {
      // spread first: shingling is CPU-bound and the fixture scan is a
      // single input split (same reasoning as Dedup.shingleTable)
      Tables.spread(t(s, d, "documents"))
        .select(explode(TextOps.wordShingles(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("bigram")).limit(100)
    }, Some(s"""
      SELECT bigram, COUNT(*) AS n_docs
      FROM (SELECT doc_id, unnest(${TextOps.wordShinglesSql("text", 2)}) AS bigram
            FROM documents) x
      GROUP BY bigram ORDER BY n_docs DESC, bigram LIMIT 100""")),

    // ---- collocations by lift (log-free PMI ranking, Church & Hanks
    // 1990): observed/expected bigram rate under unigram independence,
    // exact ppm integers — the phrase-mining companion to t06's raw
    // counts ("new york" ranks, "of the" does not) -------------------
    ("t31_collocations", (s: SparkSession, d: String) =>
      TextAnalysis.collocations(t(s, d, "documents")),
      Some(s"""
      WITH uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
                   FROM (SELECT unnest(${TextOps.wordsSql("text")}) AS w
                         FROM documents) x
                   GROUP BY w),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
      bi AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab
             FROM (SELECT unnest(${TextOps.allWordShinglesSql("text", 2)})
                     AS bigram
                   FROM documents) y
             GROUP BY bigram HAVING COUNT(*) >= 5),
      sp AS (SELECT string_split(bigram, ' ')[1] AS w_a,
                    string_split(bigram, ' ')[2] AS w_b, c_ab
             FROM bi)
      SELECT sp.w_a, sp.w_b, sp.c_ab, a.c AS c_a, b.c AS c_b,
        CAST((CAST(sp.c_ab AS HUGEINT) * tot.n_uni * 1000000)
          // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift_ppm
      FROM sp
      JOIN uni a ON a.w = sp.w_a
      JOIN uni b ON b.w = sp.w_b
      CROSS JOIN tot
      ORDER BY lift_ppm DESC, w_a, w_b LIMIT 50""")),

    // ---- vocabulary coverage per language: Good-Turing unseen mass
    // V(1)/N as floor-ppm + bias-corrected Chao1 richness floor —
    // "is more data from this feed still buying new vocabulary";
    // same spectrum shape as t32, one IEEE division at the read edge -
    ("t34_vocab_coverage", (s: SparkSession, d: String) =>
      TextAnalysis.vocabCoverage(t(s, d, "documents")),
      Some(s"""
      WITH toks AS (SELECT lang, unnest(${TextOps.wordsSql("text")}) AS w
                    FROM documents),
      tc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS m
             FROM toks GROUP BY 1, 2),
      sp AS (SELECT lang, m, CAST(COUNT(*) AS BIGINT) AS v
             FROM tc GROUP BY 1, 2),
      ag AS (SELECT lang, CAST(SUM(m * v) AS BIGINT) AS n_tokens,
                    CAST(SUM(v) AS BIGINT) AS n_types,
                    CAST(SUM(CASE WHEN m = 1 THEN v ELSE 0 END) AS BIGINT)
                      AS v1,
                    CAST(SUM(CASE WHEN m = 2 THEN v ELSE 0 END) AS BIGINT)
                      AS v2
             FROM sp GROUP BY 1)
      SELECT lang, n_tokens, n_types, v1, v2,
             CAST(1000000 * v1 // n_tokens AS BIGINT) AS unseen_ppm,
             CAST(n_types AS DOUBLE)
               + CAST(v1 * (v1 - 1) AS DOUBLE)
                 / CAST(2 * (v2 + 1) AS DOUBLE) AS chao1
      FROM ag ORDER BY lang""")),

    // ---- TextRank keywords (Mihalcea & Tarau 2004): PageRank over
    // the undirected word co-occurrence graph, g01's 2^40 integer
    // fixed point unrolled identically in SQL — graph centrality
    // catches keyphrases raw frequency misses ------------------------
    ("t33_textrank", (s: SparkSession, d: String) =>
      TextAnalysis.textrankKeywords(t(s, d, "documents")),
      Some {
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
      WITH wb AS (SELECT unnest(${TextOps.allWordShinglesSql("text", 2)})
                    AS bg FROM documents),
      pr AS (SELECT string_split(bg, ' ')[1] AS a,
                    string_split(bg, ' ')[2] AS b FROM wb),
      pf AS (SELECT a, b FROM pr WHERE a <> b),
      ed AS (SELECT src, dst, COUNT(*) AS w FROM
               (SELECT a AS src, b AS dst FROM pf
                UNION ALL SELECT b AS src, a AS dst FROM pf) u
             GROUP BY 1, 2),
      ow AS (SELECT src, SUM(w) AS ow FROM ed GROUP BY src),
      nodes AS (SELECT DISTINCT k FROM
                  (SELECT src AS k FROM ed UNION SELECT dst FROM ed) u),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT k, $scale // (SELECT n FROM nn) AS r FROM nodes),
      $iterCtes
      SELECT k AS word, CAST(r AS BIGINT) AS rank_fp FROM r3
      ORDER BY rank_fp DESC, word LIMIT 30"""
      }),

    // ---- Yule's K repeat-rate per language (Yule 1944): the
    // length-invariant richness statistic corpus QA reads next to TTR;
    // frequency SPECTRUM (lang, m) -> V(m) keeps every moment a tiny
    // partial-aggregable groupBy, DECIMAL(38,0) internally ------------
    ("t32_yule_k", (s: SparkSession, d: String) =>
      TextAnalysis.yuleK(t(s, d, "documents")),
      Some(s"""
      WITH toks AS (SELECT lang, unnest(${TextOps.wordsSql("text")}) AS w
                    FROM documents),
      tc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS m
             FROM toks GROUP BY 1, 2),
      sp AS (SELECT lang, m, CAST(COUNT(*) AS BIGINT) AS v
             FROM tc GROUP BY 1, 2),
      ag AS (SELECT lang, CAST(SUM(m * v) AS BIGINT) AS n_tokens,
                    CAST(SUM(v) AS BIGINT) AS n_types,
                    CAST(SUM(m * m * v) AS HUGEINT) AS s2
             FROM sp GROUP BY 1)
      SELECT lang, n_tokens, n_types,
             CAST(10000 * (s2 - n_tokens) AS BIGINT) AS k_num,
             CAST(10000 * (s2 - n_tokens) AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
               AS yule_k
      FROM ag ORDER BY lang""")),

    // per-doc shingle NOVELTY in ingestion (doc_id) order: fraction of
    // a doc's shingles first seen in this doc — the marginal-
    // information signal between "exact dup" and "keep"; the
    // first-occurrence index is the grow-only structure an incremental
    // pipeline persists and min-merges
    ("t21_novelty_score", (s: SparkSession, d: String) =>
      TextAnalysis.noveltyScore(t(s, d, "documents")),
      Some(s"""
      WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM documents),
      fst AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
      sc AS (SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                    CAST(SUM(CASE WHEN fst.first_doc = sh.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
             FROM sh JOIN fst USING (s) GROUP BY 1)
      SELECT d.doc_id,
             COALESCE(sc.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
             COALESCE(sc.n_novel, CAST(0 AS BIGINT)) AS n_novel,
             CASE WHEN COALESCE(sc.n_shingles, 0) = 0 THEN NULL
                  ELSE CAST(sc.n_novel AS DOUBLE) / sc.n_shingles END AS novelty
      FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""")),

    // Heaps-law vocabulary growth at a checkpoint ladder — one pass
    // over the first-occurrence table (conditional sums), never a scan
    // per checkpoint
    ("t22_vocab_growth", (s: SparkSession, d: String) =>
      TextAnalysis.vocabGrowth(t(s, d, "documents")),
      Some(s"""
      WITH rk AS (SELECT doc_id, text,
                    ROW_NUMBER() OVER (ORDER BY doc_id) AS pos FROM documents),
      sh AS (SELECT pos, unnest($shinglesSql) AS s FROM rk),
      fst AS (SELECT s, MIN(pos) AS first_pos FROM sh GROUP BY 1),
      cp AS (SELECT CAST(unnest([16, 64, 256, 1024, 4096, 16384]) AS BIGINT)
               AS checkpoint)
      SELECT cp.checkpoint,
             CAST((SELECT COUNT(*) FROM sh WHERE pos <= cp.checkpoint)
               AS BIGINT) AS n_tokens,
             CAST((SELECT COUNT(*) FROM fst WHERE first_pos <= cp.checkpoint)
               AS BIGINT) AS vocab
      FROM cp ORDER BY checkpoint""")),

    // C4-style cross-doc boilerplate coverage: 3-gram shingles in
    // >= 20 distinct docs are boilerplate; per-doc covered tokens =
    // UNION of their [pos, pos+3) intervals (gaps-and-islands in a
    // doc-PARTITIONED window — overlaps count once, runs don't
    // overshoot). The oracle reproduces positions, lexicon and the
    // interval union
    ("t23_boilerplate_coverage", (s: SparkSession, d: String) =>
      TextAnalysis.boilerplateCoverage(t(s, d, "documents"), n = 3,
        minDocs = 20L),
      Some(s"""
      WITH pw AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws FROM documents),
      ps AS (SELECT doc_id, CAST(unnest(range(len(ws) - 2)) AS INT) AS pos, ws
             FROM pw WHERE len(ws) >= 3),
      sh AS (SELECT doc_id, pos,
                    ws[pos+1] || ' ' || ws[pos+2] || ' ' || ws[pos+3] AS s
             FROM ps),
      bl AS (SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS nd
                            FROM sh GROUP BY 1) z WHERE nd >= 20),
      hits AS (SELECT doc_id, pos FROM sh JOIN bl USING (s)),
      cov AS (SELECT doc_id, pos,
                     COALESCE(MAX(pos + 3) OVER (PARTITION BY doc_id
                       ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), pos) AS prev_end
              FROM hits),
      cv AS (SELECT doc_id,
                    SUM(GREATEST(0, pos + 3 - GREATEST(pos, prev_end)))
                      AS covered
             FROM cov GROUP BY 1)
      SELECT d.doc_id,
             CAST(len(${TextOps.wordsSql("d.text")}) AS BIGINT) AS n_tokens,
             CAST(COALESCE(cv.covered, 0) AS BIGINT) AS covered,
             CAST(COALESCE(cv.covered, 0) AS DOUBLE)
               / len(${TextOps.wordsSql("d.text")}) AS frac
      FROM documents d LEFT JOIN cv USING (doc_id) ORDER BY doc_id""")),

    // the C4 removal step itself: t23's boilerplate lexicon applied —
    // covered tokens dropped, survivors reassembled in position order
    // into the cleaned text (exact string equality with the oracle's
    // string_agg reconstruction)
    ("t26_boilerplate_scrub", (s: SparkSession, d: String) =>
      TextAnalysis.boilerplateScrub(t(s, d, "documents"), n = 3,
        minDocs = 20L),
      Some(s"""
      WITH pw AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws FROM documents),
      ps AS (SELECT doc_id, CAST(unnest(range(len(ws) - 2)) AS INT) AS pos, ws
             FROM pw WHERE len(ws) >= 3),
      sh AS (SELECT doc_id, pos,
                    concat_ws(' ', ws[pos+1], ws[pos+2], ws[pos+3]) AS s
             FROM ps),
      bl AS (SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS nd
                            FROM sh GROUP BY 1) z WHERE nd >= 20),
      cov AS (SELECT DISTINCT sh.doc_id, sh.pos + o.o AS cpos
              FROM sh JOIN bl USING (s) CROSS JOIN range(3) o(o)),
      tok AS (SELECT doc_id, CAST(unnest(range(len(ws))) AS INT) AS pos, ws
              FROM pw),
      tok2 AS (SELECT doc_id, pos, ws[pos+1] AS tok FROM tok),
      kept AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                      COALESCE(string_agg(t.tok, ' ' ORDER BY t.pos), '')
                        AS scrubbed_text
               FROM tok2 t LEFT JOIN cov
                 ON cov.doc_id = t.doc_id AND cov.cpos = t.pos
               WHERE cov.doc_id IS NULL GROUP BY 1)
      SELECT d.doc_id,
             CAST(len(${TextOps.wordsSql("d.text")}) AS BIGINT) AS n_tokens,
             CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
             COALESCE(k.scrubbed_text, '') AS scrubbed_text
      FROM documents d LEFT JOIN kept k USING (doc_id)
      ORDER BY d.doc_id""")),

    // Gopher intra-doc repetition rules at token granularity:
    // duplicate-word fraction + most-frequent-bigram share — the
    // within-doc degeneracy that cross-doc dedup can't see
    ("t24_intradoc_repetition", (s: SparkSession, d: String) =>
      TextAnalysis.intraDocRepetition(t(s, d, "documents")),
      Some(s"""
      WITH wx AS (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tok
                  FROM documents),
      wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM wx GROUP BY 1, 2),
      wst AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct
              FROM wc GROUP BY 1),
      bx AS (SELECT doc_id, unnest(${TextOps.allWordShinglesSql("text", 2)})
               AS bg FROM documents),
      bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bx GROUP BY 1, 2),
      bst AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n,
                     CAST(SUM(c) AS BIGINT) AS n_bigrams
              FROM bc GROUP BY 1)
      SELECT d.doc_id, wst.n_words, wst.n_distinct,
             CAST(wst.n_words - wst.n_distinct AS DOUBLE) / wst.n_words
               AS dup_frac,
             CAST(COALESCE(bst.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
             CAST(COALESCE(bst.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CASE WHEN COALESCE(bst.n_bigrams, 0) > 0
                  THEN CAST(bst.top_bigram_n AS DOUBLE) / bst.n_bigrams
             END AS top_bigram_share
      FROM documents d
      JOIN wst USING (doc_id) LEFT JOIN bst USING (doc_id)
      ORDER BY doc_id""")),

    // Misra-Gries heavy hitters (functions.MisraGriesAggregator): the
    // DETERMINISTIC-guarantee counterpart to the Count-Min sketch
    // (t09), audited like the recall queries (d20/d21): the stream is
    // unigram occurrences + per-doc-distinct word bigrams (vocab ~950
    // >> k = 64, so the summary genuinely decrements and merges, with
    // ~30 true heavy tokens), and the oracle states the THEOREMS as
    // values — every token above n/(k+1) captured, every estimate in
    // [true - n/(k+1), true] — which hold for every partition merge
    // order, making the row hash-stable despite MG's order-dependent
    // survivor set.
    ("t20_heavy_hitters", (s: SparkSession, d: String) => {
      val k = 64
      val docs = Tables.spread(t(s, d, "documents"))
      val stream = docs
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .unionByName(docs
          .select(explode(TextOps.wordShingles(col("text"), 2)).as("tok")))
        .cpGuard() // feeds both the sketch and the exact audit
      val mg = stream
        .agg(graft.functions.MisraGries.heavyHitters(k)(col("tok")).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.tok").as("tok"), col("e.est").as("est"))
      val exact = stream.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = exact.agg(sum(col("cnt")).as("n_total"))
      val heavy = col("cnt") * (k + 1) > col("n_total")
      val bad = col("est").isNotNull && (col("est") > col("cnt") ||
        (col("cnt") - col("est")) * (k + 1) > col("n_total"))
      exact.join(mg, Seq("tok"), "left")
        .crossJoin(broadcast(tot)) // 1-row summary attach
        .agg(max(col("n_total")).as("n_total"),
          sum(when(heavy, 1L).otherwise(0L)).as("n_heavy"),
          sum(when(heavy && col("est").isNotNull, 1L).otherwise(0L))
            .as("n_captured"),
          sum(when(bad, 1L).otherwise(0L)).as("n_bad"))
        .select(col("n_total"), col("n_heavy"), col("n_captured"),
          (col("n_bad") === 0).as("all_bounds_ok"))
    }, Some(s"""
      WITH uni AS (SELECT unnest(${TextOps.wordsSql("text")}) AS tok FROM documents),
      bi AS (SELECT unnest(${TextOps.wordShinglesSql("text", 2)}) AS tok FROM documents),
      stream AS (SELECT tok FROM uni WHERE tok <> '' UNION ALL SELECT tok FROM bi),
      c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM stream GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM c)
      SELECT n_total,
             CAST((SELECT COUNT(*) FROM c WHERE cnt * 65 > n_total) AS BIGINT)
               AS n_heavy,
             CAST((SELECT COUNT(*) FROM c WHERE cnt * 65 > n_total) AS BIGINT)
               AS n_captured,
             TRUE AS all_bounds_ok
      FROM tot""")),

    // statistical LM-quality proxy: mean corpus bigram frequency per
    // doc (CCNet-style filter without the external LM); fixed-point
    // mean makes the doubles bit-portable
    ("t15_lm_quality", (s: SparkSession, d: String) =>
      TextAnalysis.lmQualityScore(t(s, d, "documents")),
      Some(s"""
      WITH bi AS (SELECT doc_id, unnest(${TextOps.wordShinglesSql("text", 2)}) AS bigram
                  FROM documents),
      cnts AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM bi GROUP BY bigram),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM bi),
      f AS (SELECT doc_id,
                   CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS freq
            FROM bi JOIN cnts USING (bigram) CROSS JOIN tot)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(floor(freq * CAST(1099511627776 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS mean_freq
      FROM f GROUP BY doc_id ORDER BY doc_id""")),

    // model-based quality filtering (the GPT-3/LLaMA curation shape):
    // an exact-count odds classifier trained on curated-vs-crawl
    // sources (here: src0-4 as the curated positives, src15-19 as the
    // crawl negatives), scoring EVERY document with a broadcast weight
    // table — w(t) = n_pos(t)*N_neg - n_neg(t)*N_pos, all integers, so
    // the learned model itself is value-verified cross-engine
    ("t19_quality_classifier", (s: SparkSession, d: String) =>
      TextAnalysis.oddsQualityClassifier(t(s, d, "documents"),
        posSources = (0 to 4).map("src" + _),
        negSources = (15 to 19).map("src" + _)),
      Some(s"""
      WITH tok AS (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tk
                   FROM documents),
      lab AS (SELECT doc_id,
                     source IN ('src0','src1','src2','src3','src4') AS pos
              FROM documents
              WHERE source IN ('src0','src1','src2','src3','src4',
                               'src15','src16','src17','src18','src19')),
      cnt AS (SELECT tk,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                     CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
              FROM tok JOIN lab USING (doc_id) GROUP BY tk),
      tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS np,
                     CAST(SUM(n_neg) AS BIGINT) AS nn FROM cnt),
      wt AS (SELECT tk,
                    n_pos * (SELECT nn FROM tot)
                      - n_neg * (SELECT np FROM tot) AS w
             FROM cnt),
      sc AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score
             FROM tok JOIN wt USING (tk) GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(len(${TextOps.wordsSql("d.text")}) AS INT) AS n_tokens,
             COALESCE(sc.score, 0) AS score,
             COALESCE(sc.score, 0) > 0 AS keep
      FROM documents d LEFT JOIN sc USING (doc_id)
      ORDER BY d.doc_id""")),

    // deterministic stratified sample: first-20-per-lang in
    // (hash32(text), doc_id) order — seedless, engine-reproducible;
    // runs the map-side TopKAggregator path (the 100 TB shape)
    ("t07_stratified_sample", (s: SparkSession, d: String) =>
      Curation.stratifiedSample(t(s, d, "documents"), "lang", perStratum = 20),
      Some("""
      SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY ('0x'||substr(md5(text),1,8))::BIGINT, doc_id) AS INT) AS rk
        FROM documents) z
      WHERE rk <= 20 ORDER BY lang, rk""")),

    // contiguous greedy packing into fixed-capacity bins (sequence
    // packing for training batches); all-integer running sums, computed
    // through the range-partitioned PrefixSum operator (the 100 TB shape)
    ("t08_doc_packing", (s: SparkSession, d: String) =>
      Curation.packDocs(t(s, d, "documents"), "lang", "n_chars",
        capacity = 4096, scalable = true),
      Some("""
      SELECT doc_id, lang, n_chars,
             CAST(COALESCE(SUM(n_chars) OVER w, 0) AS BIGINT) AS offset_in_stratum,
             CAST(COALESCE(SUM(n_chars) OVER w, 0) // 4096 AS BIGINT) AS bin_id
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ORDER BY lang, doc_id""")),

    // the whole curation DAG composed: exact dedup -> quality gate ->
    // stratified sample -> sequence packing, one oracle-verified query
    ("c01_corpus_build", (s: SparkSession, d: String) =>
      Curation.corpusBuild(t(s, d, "documents"),
        perStratum = 30, qualityMin = 0.6, capacity = 4096),
      Some {
        val allStop = TextAnalysis.stopwords.flatMap(_._2)
          .map(w => s"'$w'").mkString(", ")
        val ws = TextOps.wordsSql("text")
        s"""
        WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        k AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        cc AS (SELECT doc_id,
                 CAST(len($ws) AS INT) AS n_words,
                 CAST(len(list_distinct($ws)) AS INT) AS n_distinct,
                 CAST(len(list_filter($ws, w -> w IN ($allStop))) AS INT) AS n_stop,
                 CAST(length(text) AS INT) AS len FROM k),
        q AS (SELECT doc_id,
                0.4 * (CAST(n_distinct AS DOUBLE) / n_words)
                  + 0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_words)
                  + 0.2 * LEAST((CAST(len - n_words + 1 AS DOUBLE) / n_words) / 10.0, 1.0) AS quality
              FROM cc),
        good AS (SELECT k.doc_id, k.lang, k.n_chars, k.text, q.quality
                 FROM k JOIN q USING (doc_id) WHERE quality >= 0.6),
        samp AS (SELECT doc_id, lang, n_chars, quality, rk FROM (
                   SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY ('0x'||substr(md5(text),1,8))::BIGINT, doc_id) AS INT) AS rk
                   FROM good) z
                 WHERE rk <= 30)
        SELECT doc_id, lang, n_chars, quality, rk,
               CAST(COALESCE(SUM(n_chars) OVER w, 0) AS BIGINT) AS offset_in_stratum,
               CAST(COALESCE(SUM(n_chars) OVER w, 0) // 4096 AS BIGINT) AS bin_id
        FROM samp
        WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ORDER BY lang, doc_id"""
      }),

    // token-budget mixture plan: per-lang token inventory, quota and
    // epoch (repeat) factor for a 1M-token budget at fixed weights
    ("c07_token_budget", (s: SparkSession, d: String) =>
      Curation.tokenBudgetPlan(t(s, d, "documents"), "lang",
        budgetTokens = 1000000L,
        weights = Map("en" -> 50, "de" -> 20, "fr" -> 10, "es" -> 10, "zh" -> 10)),
      Some(s"""
      WITH w AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(${TextOps.wordsSql("text")})) AS BIGINT) AS n_tokens,
                   CAST(CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                        WHEN 'fr' THEN 10 WHEN 'es' THEN 10
                        WHEN 'zh' THEN 10 END AS INT) AS weight_pct
                 FROM documents
                 WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')
                 GROUP BY lang)
      SELECT lang, n_docs, n_tokens, weight_pct,
             CAST((1000000 * weight_pct) // 100 AS BIGINT) AS quota_tokens,
             CAST((1000000 * weight_pct) // 100 AS DOUBLE)
               / CAST(n_tokens AS DOUBLE) AS epochs
      FROM w ORDER BY lang""")),

    // DSIR-style target-affinity selection: keep the 50 training docs
    // whose bigram mass best matches the doc_id<20 target set
    ("c08_target_select", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Curation.targetSelect(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        topN = 50)
    }, Some(s"""
      WITH tgt AS (SELECT bigram, COUNT(*) AS tc FROM (
                     SELECT unnest(${TextOps.wordShinglesSql("text", 2)}) AS bigram
                     FROM documents WHERE doc_id < 20) z GROUP BY bigram),
      tr AS (SELECT doc_id, unnest(${TextOps.wordShinglesSql("text", 2)}) AS bigram
             FROM documents WHERE doc_id >= 20),
      sc AS (SELECT doc_id,
                    CAST(SUM(COALESCE(tc, 0)) AS BIGINT) AS score_int,
                    CAST(COUNT(*) AS BIGINT) AS n_bigrams
             FROM tr LEFT JOIN tgt USING (bigram) GROUP BY doc_id)
      SELECT doc_id, score_int, n_bigrams,
             CAST(score_int AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS affinity
      FROM sc ORDER BY affinity DESC, doc_id LIMIT 50""")),

    // tokenizer fertility by language: exact corpus-level token and
    // char inventories, per-lang chars/token and bpe-to-ws blowup
    // character-edit-distance near-dup: the verify family that catches
    // in-place edits Jaccard barely sees. levenshtein is built into
    // both engines with identical DP semantics on single-byte text —
    // and the operator restricts to single-byte text EXPLICITLY in
    // both (Spark counts chars, DuckDB counts bytes), so the oracle
    // equivalence is by construction, not fixture luck
    ("d26_edit_distance_dup", (s: SparkSession, d: String) =>
      Dedup.editDistanceDup(t(s, d, "documents"), maxDist = 40),
      Some("""
      WITH d AS (SELECT doc_id, lang, n_chars, text FROM documents
                 WHERE doc_id % 2 = 0 AND length(text) = strlen(text)),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.text, b.text) AS dist
            FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
              AND abs(a.n_chars - b.n_chars) <= 5)
      SELECT doc_a, doc_b, CAST(dist AS INT) AS dist FROM p
      WHERE dist <= 40 ORDER BY doc_a, doc_b""")),

    // shard planning for bulk writes: assign docs to fixed-byte-budget
    // shards by exact cumulative size — shard_id = exclusive-prefix-sum
    // DIV budget. The prefix sum is the range-partitioned PrefixSum
    // (one balanced exchange at any scale, never an unpartitioned
    // window); the emitted plan is per-shard stats a writer consumes
    ("c13_shard_plan", (s: SparkSession, d: String) => {
      import graft.operators.PrefixSum
      val planned = PrefixSum.withRunningSum(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("doc_id")), "n_chars", "start")
      planned.withColumn("shard_id", expr("start div 16384"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard_id"))
    }, Some("""
      WITH c AS (SELECT doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
                 FROM documents)
      SELECT CAST(start // 16384 AS BIGINT) AS shard_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM c GROUP BY 1 ORDER BY shard_id""")),

    // temperature-scaled multilingual mixture (T5 alpha=1/2): weights
    // sqrt(n_docs) at 2^20 fixed point (exact power-of-two scaling of a
    // correctly-rounded sqrt), integer total, integer floor quotas
    ("c12_temperature_mixture", (s: SparkSession, d: String) =>
      Curation.temperatureMixture(t(s, d, "documents"), "lang",
        budgetDocs = 1000L),
      Some("""
      WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY lang),
      w AS (SELECT lang, n_docs,
              CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1048576) AS BIGINT)
                AS weight_fp FROM s),
      tot AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tw FROM w)
      SELECT lang, n_docs, weight_fp,
             CAST((1000 * weight_fp) // (SELECT tw FROM tot) AS BIGINT)
               AS quota_docs
      FROM w ORDER BY lang""")),

    // priority sampling (Duffield-Lund-Thorup 2007): weighted
    // without-replacement sample of 200 docs by n_chars with the
    // unbiased subset-sum estimator w_est = max(w, tau). Priorities
    // are one exact double multiply (w * 2^32, exact below 2^21) and
    // ONE IEEE division off the shared md5 hash — no accumulation, so
    // sample AND estimator verify bit-for-bit cross-engine -----------
    ("c15_priority_sample", (s: SparkSession, d: String) =>
      Curation.prioritySample(t(s, d, "documents"), "n_chars", n = 200),
      Some("""
      WITH pr AS (SELECT doc_id, n_chars,
              (CAST(n_chars AS DOUBLE) * 4294967296.0)
                / (CAST(('0x'||substr(md5(text),1,8))::BIGINT AS DOUBLE) + 1.0)
                AS priority
            FROM documents),
      rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id)
               AS rn FROM pr),
      tau AS (SELECT COALESCE(MAX(CASE WHEN rn = 201 THEN priority END), 0.0)
                AS tau FROM rk)
      SELECT doc_id, n_chars, priority,
             GREATEST(CAST(n_chars AS DOUBLE), (SELECT tau FROM tau)) AS w_est
      FROM rk WHERE rn <= 200 ORDER BY doc_id""")),

    // DSIR-style importance selection: rank raw docs by how 'en'-like
    // their hashed-unigram distribution is (no-libm mean probability
    // ratio; see Curation.dsirSelect scaladoc) and keep the top 100.
    // 256 feature buckets; the score join is a 256-row shuffle-hash
    ("c16_dsir_select", (s: SparkSession, d: String) =>
      Curation.dsirSelect(t(s, d, "documents"), "lang", "en",
        nBuckets = 256, topK = 100),
      Some(s"""
      WITH occ AS (SELECT doc_id, lang = 'en' AS is_tgt,
              ${Hashing.h32Sql("w")} % 256 AS h
            FROM (SELECT doc_id, lang, unnest(${TextOps.wordsSql("text")}) AS w
                  FROM documents)),
      feat AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS rc,
                 CAST(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
               FROM occ GROUP BY h),
      tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rtot,
                     CAST(SUM(tc) AS BIGINT) AS ttot FROM feat),
      ratio AS (SELECT h,
                  ((CAST(tc + 1 AS DOUBLE) / CAST((SELECT ttot FROM tot) + 256 AS DOUBLE))
                   / (CAST(rc + 1 AS DOUBLE) / CAST((SELECT rtot FROM tot) + 256 AS DOUBLE)))
                  AS ratio
                FROM feat),
      sc AS (SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(CAST(floor(ratio * CAST(1099511627776 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s
             FROM occ JOIN ratio ON ratio.h = occ.h GROUP BY 1)
      SELECT doc_id, n_words,
             CAST(s AS DOUBLE) / CAST(n_words AS DOUBLE)
               / CAST(1099511627776 AS DOUBLE) AS mean_imp
      FROM sc ORDER BY mean_imp DESC, doc_id LIMIT 100""")),

    // competence-based curriculum: global shortest-first training
    // position via the SeqNumber range-partition primitive (the q30b
    // scale shape applied to curation — no unpartitioned window)
    ("c17_curriculum_order", (s: SparkSession, d: String) =>
      Curation.curriculumOrder(t(s, d, "documents")),
      Some(s"""
      WITH tk AS (SELECT doc_id,
              CAST(len(${TextOps.wordsSql("text")}) AS BIGINT) AS n_tokens,
              ${Hashing.h32Sql("text")} AS h
            FROM documents)
      SELECT doc_id, n_tokens, h,
             CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, h, doc_id) AS BIGINT) AS pos
      FROM tk ORDER BY pos""")),

    // one-row corpus datasheet (dataset-card numbers, all integer /
    // 2^20 fixed point — bit-reproducible): size, token volume,
    // shingle vocab, exact-dup count, stopword rate, language HHI
    ("c22_corpus_datasheet", (s: SparkSession, d: String) =>
      Curation.corpusDatasheet(t(s, d, "documents")),
      Some {
        val allStop = TextAnalysis.stopwords.flatMap(_._2)
          .map(w => s"'$w'").mkString(", ")
        s"""
      WITH stopc AS (SELECT SUM(CAST(len(${TextOps.wordsSql("text")}) AS BIGINT)) AS sw,
                  SUM(CAST(len(list_filter(${TextOps.wordsSql("text")},
                    w -> w IN ($allStop))) AS BIGINT)) AS ss
             FROM documents),
      lh AS (SELECT CAST(SUM(share_fp * share_fp) // 1048576 AS BIGINT) AS lang_hhi_fp
             FROM (SELECT (COUNT(*) * 1048576)
                          // (SELECT COUNT(*) FROM documents) AS share_fp
                   FROM documents GROUP BY lang) z)
      SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
             CAST((SELECT SUM(len(${TextOps.wordsSql("text")})) FROM documents)
               AS BIGINT) AS n_ws_tokens,
             CAST((SELECT COUNT(DISTINCT s) FROM
                   (SELECT unnest($shinglesSql) AS s FROM documents) sh)
               AS BIGINT) AS vocab,
             CAST((SELECT COUNT(DISTINCT md5(text)) FROM documents) AS BIGINT)
               AS n_distinct_texts,
             CAST((SELECT (ss * 1048576) // sw FROM stopc) AS BIGINT)
               AS stop_rate_fp,
             (SELECT lang_hhi_fp FROM lh) AS lang_hhi_fp"""
      }),

    // UniMax language-budget allocation (Chung et al. 2023): exact
    // integer water-filling of a 150k-token budget at <= 2 epochs per
    // language — languages sorted by capped supply ascending, each
    // takes min(cap, floor(remaining / langsLeft)). The oracle unrolls
    // the same fold as a recursive CTE, so the sequential floor
    // divisions (not just the final allocation) are value-checked.
    // sf0.01 lands cap-bound, sf0.1 budget-bound — both regimes gated
    ("c23_unimax_allocation", (s: SparkSession, d: String) =>
      Curation.unimaxAllocation(t(s, d, "documents"),
        budget = 150000L, maxEpochs = 2),
      Some(s"""
      WITH RECURSIVE lt AS (SELECT lang,
               CAST(SUM(len(${TextOps.wordsSql("text")})) AS BIGINT) AS n
             FROM documents GROUP BY 1),
      cw AS (SELECT lang, n, CAST(n * 2 AS BIGINT) AS cap,
                    CAST(ROW_NUMBER() OVER (ORDER BY n * 2, lang) AS BIGINT)
                      AS rn,
                    CAST(COUNT(*) OVER () AS BIGINT) AS k
             FROM lt),
      rec(rn, remaining, alloc) AS (
        SELECT CAST(0 AS BIGINT), CAST(150000 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT c.rn,
               r.remaining - LEAST(c.cap, r.remaining // (c.k - c.rn + 1)),
               LEAST(c.cap, r.remaining // (c.k - c.rn + 1))
        FROM rec r JOIN cw c ON c.rn = r.rn + 1)
      SELECT c.lang, c.n AS n_tokens, c.cap, r.alloc,
             CAST(r.alloc AS DOUBLE) / c.n AS epochs
      FROM cw c JOIN rec r ON c.rn = r.rn ORDER BY c.lang""")),

    // retention cohort matrix: users cohorted by first active week
    // (integer weeks since epoch — no calendar-week-start conventions),
    // distinct active users per (cohort, period) and retention vs the
    // cohort's own week 0 — the decay audit next to w20's funnel
    ("w21_retention_cohorts", (s: SparkSession, d: String) =>
      graft.ext.Funnels.retentionCohorts(t(s, d, "events")),
      Some("""
      WITH ev AS (SELECT DISTINCT user_id,
                    epoch_us(ts) // 604800000000 AS wk FROM events),
      ch AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY 1),
      act AS (SELECT DISTINCT ch.cohort_wk, ev.wk - ch.cohort_wk AS period,
                     ev.user_id
              FROM ev JOIN ch USING (user_id)),
      cnt AS (SELECT cohort_wk, period, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM act GROUP BY 1, 2),
      base AS (SELECT cohort_wk, n_users AS n0 FROM cnt WHERE period = 0)
      SELECT cnt.cohort_wk, cnt.period, cnt.n_users,
             CAST(cnt.n_users AS DOUBLE) / base.n0 AS retention
      FROM cnt JOIN base USING (cohort_wk)
      ORDER BY cohort_wk, period""")),

    // reliability diagram for the t19 odds classifier on HELD-OUT
    // labeled docs: weights train on even doc_ids, odd labeled docs are
    // scored and rank-binned into 10 equal-count bins (SeqNumber — no
    // unpartitioned window); per-bin observed positive rate vs mean
    // score is the calibration audit behind any quality threshold
    ("t25_quality_calibration", (s: SparkSession, d: String) =>
      TextAnalysis.qualityCalibration(t(s, d, "documents"),
        posSources = (0 to 4).map("src" + _),
        negSources = (15 to 19).map("src" + _), nBins = 10),
      Some {
        val posIn = (0 to 4).map(i => s"'src$i'").mkString(", ")
        val allIn = ((0 to 4) ++ (15 to 19)).map(i => s"'src$i'")
          .mkString(", ")
        s"""
      WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      te AS (SELECT * FROM documents
             WHERE doc_id % 2 = 1 AND source IN ($allIn)),
      tok AS (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tk
              FROM tr),
      lab AS (SELECT doc_id, source IN ($posIn) AS pos FROM tr
              WHERE source IN ($allIn)),
      cnt AS (SELECT tk,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos,
                     CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_neg
              FROM tok JOIN lab USING (doc_id) GROUP BY tk),
      tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS np,
                     CAST(SUM(n_neg) AS BIGINT) AS nn FROM cnt),
      wt AS (SELECT tk,
                    n_pos * (SELECT nn FROM tot)
                      - n_neg * (SELECT np FROM tot) AS w
             FROM cnt),
      sc AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score
             FROM (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tk
                   FROM te) tt
             JOIN wt USING (tk) GROUP BY doc_id),
      scored AS (SELECT te.doc_id, te.source IN ($posIn) AS pos,
                        COALESCE(sc.score, 0) AS score
                 FROM te LEFT JOIN sc USING (doc_id)),
      rkd AS (SELECT pos, score,
                     ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rk,
                     COUNT(*) OVER () AS n_total
              FROM scored),
      b AS (SELECT CAST((rk - 1) * 10 // n_total AS BIGINT) + 1 AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_pos,
                   CAST(SUM(score) AS BIGINT) AS sum_score
            FROM rkd GROUP BY 1)
      SELECT bin, n, n_pos,
             CAST(n_pos AS DOUBLE) / n AS pos_rate,
             sum_score,
             CAST(sum_score AS DOUBLE) / n AS mean_score
      FROM b ORDER BY bin"""
      }),

    // ---- exact ROC AUC of the held-out classifier scores (Mann-
    // Whitney midrank identity, Hanley & McNeil 1982) — t25's
    // discrimination companion. All integer: 2·ΣR⁺ from per-score
    // groups + an exclusive prefix count; ppm via integral div. The
    // oracle shares t25's train/score CTEs, then applies the textbook
    // single-task rank window the engine replaces with PrefixSum ----
    ("t30_auc", (s: SparkSession, d: String) =>
      TextAnalysis.aucAudit(t(s, d, "documents"),
        posSources = (0 to 4).map("src" + _),
        negSources = (15 to 19).map("src" + _)),
      Some {
        val posIn = (0 to 4).map(i => s"'src$i'").mkString(", ")
        val allIn = ((0 to 4) ++ (15 to 19)).map(i => s"'src$i'")
          .mkString(", ")
        s"""
      WITH tr AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
      te AS (SELECT * FROM documents
             WHERE doc_id % 2 = 1 AND source IN ($allIn)),
      tok AS (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tk
              FROM tr),
      lab AS (SELECT doc_id, source IN ($posIn) AS pos FROM tr
              WHERE source IN ($allIn)),
      cnt AS (SELECT tk,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos,
                     CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_neg
              FROM tok JOIN lab USING (doc_id) GROUP BY tk),
      tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS np,
                     CAST(SUM(n_neg) AS BIGINT) AS nn FROM cnt),
      wt AS (SELECT tk,
                    n_pos * (SELECT nn FROM tot)
                      - n_neg * (SELECT np FROM tot) AS w
             FROM cnt),
      sc AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score
             FROM (SELECT doc_id, unnest(${TextOps.wordsSql("text")}) AS tk
                   FROM te) tt
             JOIN wt USING (tk) GROUP BY doc_id),
      scored AS (SELECT te.doc_id, te.source IN ($posIn) AS pos,
                        COALESCE(sc.score, 0) AS score
                 FROM te LEFT JOIN sc USING (doc_id)),
      grp AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                       AS np
              FROM scored GROUP BY score),
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
      SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
             n_distinct_scores,
             CAST(s2 - npos * (npos + 1) AS BIGINT) AS auc_num,
             CAST(2 * npos * nneg AS BIGINT) AS auc_den,
             CAST((s2 - npos * (npos + 1)) * 1000000
               // (2 * npos * nneg) AS BIGINT) AS auc_ppm
      FROM agt"""
      }),

    // watermark late-data audit: replay in (synthetic, documented)
    // arrival order — event time + a deterministic 0-20min hash jitter
    // — and count per event-time hour what a 10-minute watermark would
    // drop; the high-water mark is the distributed exclusive running
    // max (PrefixSum.withRunningMax), never a single-task global window
    ("w22_watermark_audit", (s: SparkSession, d: String) => {
      val arr = unix_micros(col("ts")) +
        (graft.functions.Hashing.h32(col("event_id").cast("string")) % 1200) *
          lit(1000000L)
      graft.ext.Funnels.watermarkLateAudit(t(s, d, "events"), arr,
        delayMinutes = 10)
    }, Some(s"""
      WITH ev AS (SELECT event_id, epoch_us(ts) AS tus,
              epoch_us(ts) +
                (${Hashing.h32Sql("CAST(event_id AS VARCHAR)")} % 1200)
                  * 1000000 AS arr
            FROM events),
      hw AS (SELECT tus, MAX(tus) OVER (ORDER BY arr, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
             FROM ev)
      SELECT CAST(tus // 3600000000 AS BIGINT) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN hw IS NOT NULL AND tus < hw - 600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(SUM(CASE WHEN hw IS NOT NULL AND tus < hw - 600000000
                  THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS late_frac
      FROM hw GROUP BY 1 ORDER BY hour""")),

    // Kaplan-Meier churn survival with right-censoring: lifetime =
    // last−first event in whole hours; churned iff last event >= 1
    // day before corpus end, else censored at lifetime. Corpus
    // reduces to one row per distinct lifetime hour (bounded by the
    // observation window, not the user count); S(t) folds ascending
    // in one fixed IEEE order on that bounded table ------------------
    ("w34_kaplan_meier", (s: SparkSession, d: String) =>
      graft.ext.Funnels.kaplanMeier(t(s, d, "events"), censorDays = 1),
      Some("""
      WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS first_us,
                   MAX(epoch_us(ts)) AS last_us
                 FROM events GROUP BY 1),
      mx AS (SELECT MAX(last_us) AS m FROM u),
      du AS (SELECT (last_us - first_us) // 3600000000 AS dur_h,
               last_us <= (SELECT m FROM mx) - 86400000000 AS churn
             FROM u),
      g AS (SELECT dur_h, CAST(COUNT(*) AS BIGINT) AS n_all,
              CAST(SUM(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT)
                AS n_churn
            FROM du GROUP BY 1),
      r AS (SELECT dur_h, n_churn,
              CAST(SUM(n_all) OVER (ORDER BY dur_h DESC) AS BIGINT)
                AS n_risk
            FROM g),
      f AS (SELECT dur_h AS t_hours, n_risk, n_churn,
              1.0 - CAST(n_churn AS DOUBLE) / CAST(n_risk AS DOUBLE)
                AS factor
            FROM r WHERE n_churn > 0)
      SELECT a.t_hours, a.n_risk, a.n_churn AS d_churned,
             list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
               list(b.factor ORDER BY b.t_hours)), (x, y) -> x * y)
               AS survival
      FROM f a JOIN f b ON b.t_hours <= a.t_hours
      GROUP BY a.t_hours, a.n_risk, a.n_churn
      ORDER BY a.t_hours""")),

    // largest-remainder (Hamilton) apportionment of a 1000-slot eval /
    // labeling budget across sources: floor shares plus one extra for
    // the largest remainders (ties by name) — sum(quota) == 1000 by
    // construction, every step exact BIGINT
    ("c25_quota_apportionment", (s: SparkSession, d: String) =>
      Curation.apportionQuota(t(s, d, "documents"), "source",
        total = 1000L),
      Some("""
      WITH cnt AS (SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM cnt),
      base AS (SELECT stratum, n_docs,
                      CAST(1000 * n_docs // (SELECT nn FROM tot) AS BIGINT)
                        AS floor_q,
                      CAST(1000 * n_docs % (SELECT nn FROM tot) AS BIGINT)
                        AS rem
               FROM cnt),
      lv AS (SELECT CAST(1000 - SUM(floor_q) AS BIGINT) AS leftover FROM base),
      rk AS (SELECT stratum, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum)
               AS rn FROM base)
      SELECT b.stratum, b.n_docs, b.floor_q,
             CAST(CASE WHEN rk.rn <= (SELECT leftover FROM lv)
                  THEN 1 ELSE 0 END AS BIGINT) AS extra,
             b.floor_q + CAST(CASE WHEN rk.rn <= (SELECT leftover FROM lv)
                  THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM base b JOIN rk USING (stratum)
      ORDER BY stratum""")),

    // k-anonymity audit (Sweeney 2002) over the release metadata
    // (lang, source, 256-char length band): every quasi-identifier
    // equivalence class with < 5 members is a re-identification risk —
    // the pre-publication privacy report next to t11's PII redaction
    ("c24_k_anonymity", (s: SparkSession, d: String) =>
      Curation.kAnonymityAudit(t(s, d, "documents"), k = 5L),
      Some("""
      SELECT lang, source, CAST(n_chars // 256 AS BIGINT) AS len_band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
      ORDER BY lang, source, len_band""")),

    // 3-stage ordered event funnel (view -> click -> purchase, each
    // within 60 min of the previous conversion, strictly after it):
    // per-stage user counts + conversion fractions. Greedy earliest-
    // event chaining per user via keyed min-aggregations — no per-user
    // event arrays, no windows over the stream
    ("w20_event_funnel", (s: SparkSession, d: String) =>
      graft.ext.Funnels.eventFunnel(t(s, d, "events"),
        Seq("view", "click", "purchase"), windowMinutes = 60),
      Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                  FROM events),
      s1 AS (SELECT user_id, MIN(tus) AS ct FROM ev
             WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, MIN(e.tus) AS ct
             FROM ev e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.tus > s1.ct
               AND e.tus <= s1.ct + 3600000000 GROUP BY 1),
      s3 AS (SELECT e.user_id, MIN(e.tus) AS ct
             FROM ev e JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.tus > s2.ct
               AND e.tus <= s2.ct + 3600000000 GROUP BY 1),
      n AS (SELECT 1 AS stage, 'view' AS event_type,
                   CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
            UNION ALL
            SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
            UNION ALL
            SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT))
      SELECT n.stage, n.event_type, n.n_users,
             CASE WHEN p.n_users > 0
                  THEN CAST(n.n_users AS DOUBLE) / p.n_users
             END AS conv_from_prev,
             CASE WHEN f.n_users > 0
                  THEN CAST(n.n_users AS DOUBLE) / f.n_users
             END AS conv_from_first
      FROM n LEFT JOIN n p ON p.stage + 1 = n.stage
      CROSS JOIN (SELECT n_users FROM n WHERE stage = 1) f
      ORDER BY n.stage""")),

    // rendezvous (highest-random-weight) sharding at fleet sizes 4 and
    // 5: argmax over shards of h32("doc:shard") — growing the fleet
    // moves ~1/5 of docs instead of re-hashing everything; the argmax
    // (greatest-of-structs vs ROW_NUMBER desc) must agree doc-for-doc
    ("c21_rendezvous_shards", (s: SparkSession, d: String) =>
      Curation.rendezvousShards(t(s, d, "documents"),
        nBefore = 4, nAfter = 5),
      Some {
        def side(tag: String, n: Int, outCol: String) = s"""
      x$tag AS (SELECT d.doc_id, t.sh,
              ${Hashing.h32Sql("CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.sh AS VARCHAR)")} AS h
             FROM documents d CROSS JOIN
                  (SELECT CAST(unnest(range($n)) AS INT) AS sh) t),
      a$tag AS (SELECT doc_id, sh AS $outCol FROM (
              SELECT doc_id, sh,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY h DESC, sh DESC) AS rn
              FROM x$tag) z WHERE rn = 1)"""
        s"""
      WITH ${side("4", 4, "shard_before")}, ${side("5", 5, "shard_after")}
      SELECT doc_id, shard_before, shard_after,
             shard_before <> shard_after AS moved
      FROM a4 JOIN a5 USING (doc_id) ORDER BY doc_id"""
      }),

    // per-epoch deterministic training shuffle: dense rank of the
    // portable h32("epoch:doc_id") per epoch via the SeqNumber
    // range-partition primitive — reproducible pseudo-random order,
    // different each epoch, no RNG state, no unpartitioned window
    ("c19_epoch_shuffle", (s: SparkSession, d: String) =>
      Curation.epochShuffle(t(s, d, "documents"), epochs = 2),
      Some(s"""
      WITH ep AS (SELECT doc_id, 0 AS epoch FROM documents
                  UNION ALL SELECT doc_id, 1 FROM documents),
      k AS (SELECT epoch, doc_id,
              ${Hashing.h32Sql("CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS h
            FROM ep)
      SELECT CAST(epoch AS INT) AS epoch, doc_id, h,
             CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id)
               AS BIGINT) AS pos
      FROM k ORDER BY epoch, pos""")),

    // DoReMi-style domain reweighting (one linearized multiplicative-
    // weights step): per-domain stopword-rate excess vs the corpus in
    // exact 2^20 fixed point, baseline (domain size) times
    // (1 + eta*excess) floored at 10%, renormalized. The eta step is a
    // pure integer multiply — no division on the possibly-negative
    // excess, so Spark's trunc-div and DuckDB's floor-div can't diverge
    ("c18_domain_reweight", (s: SparkSession, d: String) =>
      Curation.domainReweight(t(s, d, "documents"), etaNum = 2L),
      Some {
        val allStop = TextAnalysis.stopwords.flatMap(_._2)
          .map(w => s"'$w'").mkString(", ")
        s"""
      WITH qc AS (SELECT source,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(len(list_filter(ws, w -> w IN ($allStop))) AS BIGINT) AS n_stop
            FROM (SELECT source, ${TextOps.wordsSql("text")} AS ws FROM documents)),
      dom AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     SUM(n_words) AS sw, SUM(n_stop) AS ss
              FROM qc GROUP BY 1),
      tot AS (SELECT SUM(sw) AS tw, SUM(ss) AS ts FROM dom),
      x AS (SELECT source, n_docs,
                   CAST((ss * 1048576) // sw AS BIGINT) AS stop_rate_fp,
                   CAST(2 * ((ts * 1048576) // tw - (ss * 1048576) // sw) AS BIGINT)
                     AS delta_fp
            FROM dom, tot),
      y AS (SELECT source, n_docs, stop_rate_fp, delta_fp,
                   CAST(n_docs * GREATEST(1048576 + delta_fp, 104857) AS BIGINT)
                     AS w_raw
            FROM x)
      SELECT source, n_docs, stop_rate_fp, delta_fp, w_raw,
             CAST(w_raw AS DOUBLE) / CAST((SELECT SUM(w_raw) FROM y) AS DOUBLE)
               AS weight
      FROM y ORDER BY source"""
      }),

    // composition showcase: mixture quotas computed AFTER near-dup
    // resolution — dedup (minhash -> connected components -> quality
    // argmax keep-list) feeding curation (temperature quotas), the way
    // the stages chain in a real corpus build. The oracle nests d22's
    // full recursive-CC oracle as a CTE under c12's quota arithmetic
    ("c14_dedup_aware_mixture", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val dropIds = Dedup.nearDupResolution(docs, threshold = 0.5)
        .filter(!col("keep")).select(col("doc_id"))
      val kept = docs.join(dropIds, Seq("doc_id"), "left_anti")
      Curation.temperatureMixture(kept, "lang", budgetDocs = 1000L)
    }, Some(s"""
      WITH res AS ($nearDupResolutionOracle),
      kept AS (SELECT d.* FROM documents d
               WHERE d.doc_id NOT IN (SELECT doc_id FROM res WHERE NOT keep)),
      s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM kept GROUP BY lang),
      w AS (SELECT lang, n_docs,
              CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1048576) AS BIGINT)
                AS weight_fp FROM s),
      tot AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tw FROM w)
      SELECT lang, n_docs, weight_fp,
             CAST((1000 * weight_fp) // (SELECT tw FROM tot) AS BIGINT)
               AS quota_docs
      FROM w ORDER BY lang""")),

    // in-engine model fitting: per-language exact least-squares
    // calibration of doc length (chars) against whitespace token count.
    // One partial-aggregable groupBy collects the five OLS power sums
    // as exact BIGINTs; slope/intercept/r2 are then a fixed, shared
    // sequence of IEEE divisions over integer operands — bit-portable
    // without any iterative solver. The shape every "train a cheap
    // calibration/quality probe on 100 TB" job wants: the model IS a
    // handful of aggregates.
    ("c11_length_regression", (s: SparkSession, d: String) => {
      val x = size(TextOps.words(col("text"))).cast("long")
      val y = col("n_chars").cast("long")
      Tables.spread(t(s, d, "documents"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
            col("n").cast("double"))
        .withColumn("r2",
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
            ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .select(col("lang"), col("n"), col("slope"), col("intercept"), col("r2"))
        .orderBy(col("lang"))
    }, Some(s"""
      WITH s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy,
                   CAST(SUM(y*y) AS BIGINT) AS syy
                 FROM (SELECT lang,
                         CAST(len(${TextOps.wordsSql("text")}) AS BIGINT) AS x,
                         CAST(n_chars AS BIGINT) AS y FROM documents) q
                 GROUP BY lang)
      SELECT lang, n,
             CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) /
                CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS intercept,
             (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) /
               (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS r2
      FROM s ORDER BY lang""")),

    ("c09_token_fertility", (s: SparkSession, d: String) =>
      Tables.spread(t(s, d, "documents"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.words(col("text"))).cast("long")).as("n_ws_tokens"),
          sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .cast("long")).as("n_bpe_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .withColumn("chars_per_ws_token",
          col("n_chars").cast("double") / col("n_ws_tokens").cast("double"))
        .withColumn("bpe_blowup",
          col("n_bpe_tokens").cast("double") / col("n_ws_tokens").cast("double"))
        .orderBy(col("lang")),
      Some(s"""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(${TextOps.wordsSql("text")})) AS BIGINT) AS n_ws_tokens,
             CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
               AS n_bpe_tokens,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(SUM(length(text)) AS DOUBLE)
               / CAST(SUM(len(${TextOps.wordsSql("text")})) AS DOUBLE) AS chars_per_ws_token,
             CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
               / CAST(SUM(len(${TextOps.wordsSql("text")})) AS DOUBLE) AS bpe_blowup
      FROM documents GROUP BY lang ORDER BY lang""")),

    // materialized budget mixture: per-doc copy counts filling each
    // lang's token quota (full epochs + greedy hash-order remainder)
    ("c10_budget_materialize", (s: SparkSession, d: String) =>
      Curation.budgetMaterialize(t(s, d, "documents"), "lang",
        budgetTokens = 1000000L,
        weights = Map("en" -> 50, "de" -> 20, "fr" -> 10, "es" -> 10, "zh" -> 10)),
      Some(s"""
      WITH tok AS (SELECT doc_id, lang,
                     CAST(len(${TextOps.wordsSql("text")}) AS BIGINT) AS n_tokens,
                     ('0x'||substr(md5(text),1,8))::BIGINT AS h
                   FROM documents
                   WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')),
      r AS (SELECT *, COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
            FROM tok),
      q AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS total,
                   CAST((1000000 * CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                        WHEN 'fr' THEN 10 WHEN 'es' THEN 10
                        WHEN 'zh' THEN 10 END) // 100 AS BIGINT) AS quota
            FROM tok GROUP BY lang)
      SELECT r.lang, r.doc_id, r.n_tokens,
             CAST(q.quota // q.total
               + CASE WHEN r.run < q.quota % q.total THEN 1 ELSE 0 END AS BIGINT)
               AS n_copies
      FROM r JOIN q USING (lang) ORDER BY lang, doc_id""")),

    // weighted mixture: per-lang quotas in the deterministic hash order
    ("c02_mixture_sample", (s: SparkSession, d: String) =>
      Curation.mixtureSample(t(s, d, "documents"), "lang",
        Map("en" -> 40, "de" -> 15, "fr" -> 10, "es" -> 10, "zh" -> 5)),
      Some("""
      SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY ('0x'||substr(md5(text),1,8))::BIGINT, doc_id) AS INT) AS rk
        FROM documents) z
      WHERE rk <= CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 15
                            WHEN 'fr' THEN 10 WHEN 'es' THEN 10
                            WHEN 'zh' THEN 5 ELSE 0 END
      ORDER BY lang, rk""")),

    // decontamination: train docs (id >= 20) sharing any 3-word shingle
    // with the stand-in eval set (id < 20), with shared-shingle counts
    ("c03_decontaminate", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
        shingleSize = Dedup.ShingleSize)
    }, Some(s"""
      WITH ev AS (SELECT DISTINCT unnest($shinglesSql) AS s
                  FROM documents WHERE doc_id < 20),
      tr AS (SELECT doc_id, unnest($shinglesSql) AS s
             FROM documents WHERE doc_id >= 20)
      SELECT doc_id, COUNT(*) AS n_shared_shingles
      FROM tr JOIN ev USING (s)
      GROUP BY doc_id ORDER BY doc_id""")),

    // frequency-estimation sketch, estimates oracle-exact (like d13)
    ("t09_countmin", (s: SparkSession, d: String) =>
      TextAnalysis.countMinWords(t(s, d, "documents"), width = 512, topK = 10),
      Some(countMinOracle)),

    // Gopher-style repetition filters (templated/spam text detection)
    ("t10_repetition_metrics", (s: SparkSession, d: String) =>
      TextAnalysis.repetitionMetrics(t(s, d, "documents")),
      Some(repetitionOracle)),

    // PII scrubbing over deterministically planted emails/phones/IPs —
    // counts AND the redacted-text fingerprint verify cross-engine
    ("t11_pii_redact", (s: SparkSession, d: String) => {
      val planted = t(s, d, "documents").withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" 555-867-5309")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" 10.0.0."), pmod(col("doc_id"), lit(250))))
          .otherwise(lit(""))))
      TextAnalysis.piiRedact(planted)
    }, Some(s"""
      WITH planted AS (SELECT doc_id,
        text || CASE WHEN doc_id % 3 = 0
                     THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                     ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN ' 555-867-5309' ELSE '' END ||
        CASE WHEN doc_id % 7 = 0
             THEN ' 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
             ELSE '' END AS text
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}')) AS INT) AS n_emails,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.PhonePattern}')) AS INT) AS n_phones,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.Ipv4Pattern}')) AS INT) AS n_ips,
        md5(regexp_replace(regexp_replace(regexp_replace(text,
          '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
          '${TextAnalysis.PhonePattern}', '<PHONE>', 'g'),
          '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g')) AS redacted_md5,
        (len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}'))
          + len(regexp_extract_all(text, '${TextAnalysis.PhonePattern}'))
          + len(regexp_extract_all(text, '${TextAnalysis.Ipv4Pattern}'))) > 0 AS has_pii
      FROM planted ORDER BY doc_id""")),

    // deterministic content-hash train/val/test assignment
    ("t12_hash_split", (s: SparkSession, d: String) =>
      Curation.hashSplit(t(s, d, "documents"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)),
      Some(hashSplitOracle)),

    // LEAKAGE-SAFE split: t12's hash split applied to the near-dup
    // CLUSTER representative instead of the doc, so an entire minhash
    // component co-travels into one split — a near-duplicate can never
    // straddle train/eval. Oracle = the d09 closure + the t12 rule
    ("c20_cluster_safe_split", (s: SparkSession, d: String) =>
      Curation.clusterSafeSplit(t(s, d, "documents"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10), threshold = 0.5),
      Some {
        val rb = Hashing.h32Sql("CAST(rep_id AS VARCHAR)")
        s"""
      WITH RECURSIVE $minhashCtes,
      dup AS (SELECT doc_a, doc_b FROM com
              WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common) >= 0.5),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM dup
                UNION SELECT doc_b, doc_a FROM dup),
      reach(src, dst) AS (
        (SELECT src, dst FROM edges UNION SELECT src, src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      cl AS (SELECT src AS doc_id, MIN(dst) AS rep_id FROM reach GROUP BY src),
      r AS (SELECT d.doc_id, COALESCE(cl.rep_id, d.doc_id) AS rep_id
            FROM documents d LEFT JOIN cl USING (doc_id))
      SELECT doc_id, rep_id, $rb % 100 AS bucket,
             CASE WHEN $rb % 100 < 80 THEN 'train'
                  WHEN $rb % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM r ORDER BY doc_id"""
      }),

    // context-window chunking: docs -> overlapping training sequences
    ("t13_chunking", (s: SparkSession, d: String) =>
      Curation.chunkDocs(t(s, d, "documents"), chunkWords = 64, stride = 48),
      Some(s"""
      WITH w AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws FROM documents),
      n AS (SELECT doc_id, ws,
                   CAST(1 + (GREATEST(len(ws) - 64, 0) + 47) // 48 AS INT) AS nc
            FROM w)
      SELECT doc_id,
             CAST(unnest(range(nc)) AS INT) AS chunk_idx,
             unnest(list_transform(range(nc),
               i -> array_to_string(list_slice(ws, CAST(i AS INT) * 48 + 1,
                 CAST(i AS INT) * 48 + 64), ' '))) AS chunk_text,
             CAST(unnest(list_transform(range(nc),
               i -> len(list_slice(ws, CAST(i AS INT) * 48 + 1,
                 CAST(i AS INT) * 48 + 64)))) AS INT) AS n_chunk_words
      FROM n ORDER BY doc_id, chunk_idx""")),

    // repeated-passage detection over planted boilerplate (10% of docs
    // share an appended 80-char banner; every 60-char window inside it
    // repeats corpus-wide)
    // maximal repeated-span extraction (exact-substring dedup, the
    // per-doc cut list): consecutive shared-window positions merge
    // into one span via the pos - row_number island trick. The planted
    // banner surfaces as ONE span per planted doc, not 22 window rows
    ("d28_repeated_spans", (s: SparkSession, d: String) => {
      val planted = t(s, d, "documents").withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"),
          lit(" SUBSCRIBE TO OUR NEWSLETTER TODAY FOR ALL THE LATEST UPDATES AND BREAKING NEWS")))
          .otherwise(col("text")))
      Dedup.repeatedSpans(planted, windowChars = 60, minDocs = 5)
    }, Some("""
      WITH planted AS (SELECT doc_id,
        text || CASE WHEN doc_id % 10 = 0
                     THEN ' SUBSCRIBE TO OUR NEWSLETTER TODAY FOR ALL THE LATEST UPDATES AND BREAKING NEWS'
                     ELSE '' END AS text
        FROM documents),
      win AS (SELECT doc_id,
                     unnest(range(1, length(text) - 58)) AS pos,
                     unnest(list_transform(range(1, length(text) - 58),
                       i -> substr(text, CAST(i AS INT), 60))) AS w
              FROM planted WHERE length(text) >= 60),
      shared AS (SELECT w FROM (SELECT w, COUNT(DISTINCT doc_id) AS n_docs
                                FROM win GROUP BY w) g
                 WHERE n_docs >= 5),
      marked AS (SELECT doc_id, pos FROM win JOIN shared USING (w)),
      runs AS (SELECT doc_id, pos,
                      pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY pos) AS rid FROM marked)
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
             CAST(COUNT(*) + 59 AS BIGINT) AS span_chars,
             CAST(COUNT(*) AS BIGINT) AS n_windows
      FROM runs GROUP BY doc_id, rid
      ORDER BY doc_id, span_start""")),

    ("d15_repeated_passages", (s: SparkSession, d: String) => {
      val planted = t(s, d, "documents").withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"),
          lit(" SUBSCRIBE TO OUR NEWSLETTER TODAY FOR ALL THE LATEST UPDATES AND BREAKING NEWS")))
          .otherwise(col("text")))
      Dedup.repeatedPassages(planted, windowChars = 60, minDocs = 5)
    }, Some("""
      WITH planted AS (SELECT doc_id,
        text || CASE WHEN doc_id % 10 = 0
                     THEN ' SUBSCRIBE TO OUR NEWSLETTER TODAY FOR ALL THE LATEST UPDATES AND BREAKING NEWS'
                     ELSE '' END AS text
        FROM documents),
      win AS (SELECT doc_id,
                     unnest(list_transform(range(1, length(text) - 58),
                       i -> substr(text, CAST(i AS INT), 60))) AS w
              FROM planted WHERE length(text) >= 60),
      grp AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                     CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                     CAST(MIN(doc_id) AS BIGINT) AS first_doc
              FROM win GROUP BY w)
      SELECT md5(w) AS passage_md5, n_docs, n_occurrences, first_doc
      FROM grp WHERE n_docs >= 5 ORDER BY passage_md5""")),

    // Bloom membership sketch: filter words, probe verdicts, and even
    // the false positives verify value-for-value (like d13/t09)
    ("d14_bloom_membership", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Dedup.bloomMembership(docs.filter(col("doc_id") < 400), docs,
        mBits = 65536, kHashes = 4)
    }, Some(bloomOracle)),

    // incremental near-dedup: fresh batch (odd ids) vs corpus (even ids)
    ("c04_incremental_dedup", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Dedup.minhashDupAgainst(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), threshold = 0.5)
    }, Some(incrementalDupOracle)),

    // incremental DIRECTED containment: fresh batch (odd ids) probed
    // against the existing corpus's (even ids) inverted shingle index —
    // the ingestion-time twin of d19 (uncapped for the same
    // oracle-parity reason)
    ("c05_incremental_containment", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Dedup.containmentDupAsymAgainst(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        threshold = 0.8, probeK = 4, maxBucket = Int.MaxValue)
    }, Some(s"""
      WITH sh0 AS (SELECT DISTINCT doc_id, s FROM
                     (SELECT doc_id, unnest($shinglesSql) AS s FROM documents)),
      hh AS (SELECT DISTINCT doc_id, ${Hashing.h32Sql("s")} AS h FROM sh0),
      probe AS (SELECT doc_id AS doc_a, h FROM
                  (SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY h) AS rn FROM hh WHERE doc_id % 2 = 1)
                WHERE rn <= 4),
      cand AS (SELECT p.doc_a, x.doc_id AS doc_b
               FROM probe p JOIN hh x ON x.h = p.h AND x.doc_id % 2 = 0
               GROUP BY p.doc_a, x.doc_id HAVING COUNT(*) >= 2),
      arr AS (SELECT doc_id, $shinglesSql AS sa FROM documents),
      com AS (SELECT doc_a, doc_b,
                     CAST(len(list_intersect(a.sa, b.sa)) AS INT) AS n_common,
                     CAST(len(a.sa) AS INT) AS na
              FROM cand JOIN arr a ON a.doc_id = doc_a
                        JOIN arr b ON b.doc_id = doc_b)
      SELECT doc_a, doc_b, n_common,
             CAST(n_common AS DOUBLE) / na AS containment
      FROM com WHERE CAST(n_common AS DOUBLE) / na >= 0.8
      ORDER BY doc_a, doc_b""")),

    ("m01_multimodal_meta", (s: SparkSession, d: String) =>
      Multimodal.mediaPipeline(t(s, d, "documents")),
      Some(multimodalOracle)),

    // ---- multimodal frame explosion: one row per fixed-size frame ----
    ("m02_multimodal_frames", (s: SparkSession, d: String) => {
      val fb = Multimodal.FrameBytes
      Multimodal.withPayload(t(s, d, "documents").filter(col("doc_id") < 30))
        .withColumn("n_frames",
          ceil(col("media_meta.n_bytes").cast("double") / fb).cast("int"))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), col("n_frames") - 1),
            i => upper(hex(col("payload").substr(i * fb + 1, lit(fb))))))
            .as(Seq("frame_idx", "frame_hex")))
        .orderBy(col("doc_id"), col("frame_idx"))
    }, Some(s"""
      SELECT doc_id,
        CAST(unnest(range(CAST(ceil(CAST(strlen(text) AS DOUBLE) / ${Multimodal.FrameBytes}) AS BIGINT))) AS INT) AS frame_idx,
        unnest(list_transform(range(CAST(ceil(CAST(strlen(text) AS DOUBLE) / ${Multimodal.FrameBytes}) AS BIGINT)),
          i -> upper(hex(substr(text, CAST(i AS INT) * ${Multimodal.FrameBytes} + 1, ${Multimodal.FrameBytes}))))) AS frame_hex
      FROM documents WHERE doc_id < 30 ORDER BY doc_id, frame_idx""")),

    // ---- REAL image decode: javax.imageio round-trip on synthetic PNGs
    // whose dims/pixels are pure functions of doc_id, so the oracle
    // verifies the actual codec output analytically ------------------
    ("m03_image_decode", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      Multimodal.decodeImages(Multimodal.syntheticImages(docs))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CAST(4 + doc_id % 13 AS INT) AS width,
        CAST(3 + doc_id % 7 AS INT) AS height,
        CAST(list_sum(list_transform(range((4 + doc_id % 13) * (3 + doc_id % 7)),
          i -> (doc_id*31 + i) % 256)) AS BIGINT) AS pixel_sum
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // ---- ViT-style patch tokenization over REAL decoded images:
    // non-overlapping 2x2 patches (ragged edge cropped), exact integer
    // patch sums; the oracle regenerates every pixel analytically from
    // the synthetic rule pix(x,y) = (id*31 + y*w + x) % 256 ----------
    ("m11_image_patches", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      Multimodal.imagePatches(Multimodal.syntheticImages(docs), p = 2)
        .orderBy(col("doc_id"), col("py"), col("px"))
    }, Some("""
      WITH g AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
                 FROM documents WHERE doc_id < 200),
      gx AS (SELECT doc_id, w, h, unnest(range(w // 2)) AS px FROM g),
      gxy AS (SELECT doc_id, w, h, px, unnest(range(h // 2)) AS py FROM gx)
      SELECT doc_id, CAST(px AS INT) AS px, CAST(py AS INT) AS py,
        CAST(  (doc_id*31 + (2*py)*w   + 2*px)     % 256
             + (doc_id*31 + (2*py)*w   + 2*px + 1) % 256
             + (doc_id*31 + (2*py+1)*w + 2*px)     % 256
             + (doc_id*31 + (2*py+1)*w + 2*px + 1) % 256 AS BIGINT)
          AS patch_sum
      FROM gxy ORDER BY doc_id, py, px""")),

    // ---- area-average image resize (box-filter downsample to 2x2)
    // over REAL decoded pixels: the fixed-input-size normalization
    // before a vision encoder; integer-division area partition
    // (x*g div w) is one closed-form both engines share, exact cell
    // sums/counts, one IEEE division for the mean --------------------
    ("m12_image_resize", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      Multimodal.imageResize(Multimodal.syntheticImages(docs), gw = 2,
          gh = 2)
        .orderBy(col("doc_id"), col("cy"), col("cx"))
    }, Some("""
      WITH g AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
                 FROM documents WHERE doc_id < 200),
      gx AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM g),
      gxy AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM gx)
      SELECT doc_id,
             CAST((x * 2) // w AS INT) AS cx,
             CAST((y * 2) // h AS INT) AS cy,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM((doc_id * 31 + y * w + x) % 256) AS BIGINT) AS px_sum,
             CAST(SUM((doc_id * 31 + y * w + x) % 256) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_px
      FROM gxy GROUP BY 1, 2, 3 ORDER BY doc_id, cy, cx""")),

    // ---- lossy-codec (JPEG) decode audit: quality-pinned JPEG
    // encode -> real javax.imageio decode -> per-pixel compare against
    // the analytic smooth-ramp truth. Geometry survives the codec
    // exactly; content is lossy, so the gate rides the engine-computed
    // bounded-error booleans (probed over the full 1547-id rule period:
    // worst max-err < 8, worst mean-err < 2 — tolerances 24/8 are
    // codec-variation headroom, and a decoder regression flips the
    // booleans and fails this row) ---------------------------------
    ("m14_jpeg_decode_audit", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 200)
      Multimodal.jpegDecodeAudit(docs).orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
        CAST(4 + doc_id % 13 AS INT) AS width,
        CAST(3 + doc_id % 7 AS INT) AS height,
        CAST((4 + doc_id % 13) * (3 + doc_id % 7) AS BIGINT) AS n_px,
        TRUE AS within_max_tol, TRUE AS within_mean_tol
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // ---- perceptual image dedup (dHash over REAL decoded pixels) ----
    // the multimodal near-dup story: the same pattern rendered at
    // different resolutions hashes identically (m04 groups find the
    // cross-resolution exact-duplicates); a perturbed rendition lands a
    // few bits away and is recovered by the banded Hamming join (m05).
    // The oracle recomputes every cell analytically from the md5 cell
    // rule — it never decodes an image, yet checks the real
    // encode->decode->sample->hash path value-for-value.
    ("m04_phash_groups", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      Multimodal.dhash64(Multimodal.syntheticPatternImages(docs))
        .groupBy(col("dhash"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("width") * lit(1000) + col("height")).as("n_sizes"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("dhash"))
    }, Some(s"""
      WITH $phashDocsCte
      SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT w*1000 + h) AS BIGINT) AS n_sizes,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      FROM hd GROUP BY dhash ORDER BY dhash""")),

    ("m05_phash_neardup", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val hashed = Multimodal.dhash64(Multimodal.syntheticPatternImages(docs))
      // maxBucket = MaxValue: the analytic oracle below does not model
      // the HotBuckets cap, so the verified run must not prune either
      // (same rule as d19; the operator's default stays capped)
      Dedup.fingerprintNearDup(
        hashed.select(col("doc_id"), col("dhash").as("fp")),
        minHamming = 1, maxHamming = 4, maxBucket = Int.MaxValue)
    }, Some(s"""
      WITH $phashDocsCte
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
      FROM hd a JOIN hd b ON a.doc_id < b.doc_id
       AND ((a.dhash & 65535) = (b.dhash & 65535) OR
            ((a.dhash >> 16) & 65535) = ((b.dhash >> 16) & 65535) OR
            ((a.dhash >> 32) & 65535) = ((b.dhash >> 32) & 65535) OR
            ((a.dhash >> 48) & 65535) = ((b.dhash >> 48) & 65535))
      WHERE bit_count(xor(a.dhash, b.dhash)) BETWEEN 1 AND 4
      ORDER BY doc_a, doc_b""")),

    // REAL audio codec round-trip: encode deterministic PCM16 WAV per
    // doc (Multimodal.syntheticAudio), decode with the JDK's
    // javax.sound.sampled, emit exact integer features (sample count,
    // energy, zero crossings). The oracle regenerates the samples from
    // the closed-form generator with generate_series — it never parses
    // WAV — so equality proves the real encode+decode is lossless and
    // the feature math exact, the m03 discipline applied to audio.
    ("m06_audio_decode", (s: SparkSession, d: String) =>
      Multimodal.decodeAudio(Multimodal.syntheticAudio(t(s, d, "documents")))
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("sum_sq"), col("n_zero_cross"))
        .orderBy(col("doc_id")),
      Some(s"""
      WITH m AS (SELECT doc_id, 256 + (doc_id % 7) * 64 AS n FROM documents),
      idx AS (SELECT doc_id, n, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
              FROM m),
      vals AS (SELECT doc_id, i,
                      ((doc_id * 31 + i * 7) % 2001) - 1000 AS v
               FROM idx),
      lagd AS (SELECT doc_id, v,
                      LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
               FROM vals)
      SELECT doc_id,
             CAST(${Multimodal.AudioRate} AS INT) AS sample_rate,
             CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(v * v) AS BIGINT) AS sum_sq,
             CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
      FROM lagd GROUP BY doc_id ORDER BY doc_id""")),

    // ---- audio resample (decimation by 2, pair averaging) over REAL
    // WAV decode: the sample-rate normalization before a fixed-rate
    // encoder; (a+b) >> 1 is floor division in BOTH engines (the w32
    // arithmetic-shift discipline), trailing odd sample dropped,
    // exact integer features of the decimated signal -----------------
    ("m13_audio_resample", (s: SparkSession, d: String) =>
      Multimodal.audioResample(Multimodal.syntheticAudio(t(s, d, "documents")))
        .orderBy(col("doc_id")),
      Some("""
      WITH m AS (SELECT doc_id, 256 + (doc_id % 7) * 64 AS n FROM documents),
      idx AS (SELECT doc_id, n,
                     unnest(generate_series(0, CAST(n // 2 - 1 AS BIGINT)))
                       AS j
              FROM m),
      vals AS (SELECT doc_id, n, j,
                 ((((doc_id * 31 + (2 * j) * 7) % 2001) - 1000)
                  + (((doc_id * 31 + (2 * j + 1) * 7) % 2001) - 1000))
                 >> 1 AS v
               FROM idx),
      lagd AS (SELECT doc_id, n, v,
                      LAG(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
               FROM vals)
      SELECT doc_id,
             CAST(n AS BIGINT) AS n_in,
             CAST(COUNT(*) AS BIGINT) AS n_out,
             CAST(SUM(v * v) AS BIGINT) AS sum_sq_out,
             CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
                           THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_cross_out
      FROM lagd GROUP BY doc_id, n ORDER BY doc_id""")),

    // ---- energy-based audio segmentation (the VAD shape): real WAV
    // decode -> 64-sample frame energies (exact integers) -> gaps-and-
    // islands merge of consecutive active frames; only active segments
    // would reach the expensive audio encoder. Oracle regenerates the
    // samples analytically and applies the identical islands rule ----
    ("m10_audio_segments", (s: SparkSession, d: String) =>
      Multimodal.audioEnergySegments(
        Multimodal.syntheticAudio(t(s, d, "documents")),
        windowSamples = 64, energyThreshold = 21500000L),
      Some(s"""
      WITH m AS (SELECT doc_id, 256 + (doc_id % 7) * 64 AS n FROM documents),
      idx AS (SELECT doc_id, n,
                     unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS i
              FROM m),
      vals AS (SELECT doc_id, i // 64 AS w,
                      ((doc_id * 31 + i * 7) % 2001) - 1000 AS v
               FROM idx),
      we AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS e
             FROM vals GROUP BY 1, 2),
      act AS (SELECT doc_id, w, e,
                w - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w)
                  AS grp
              FROM we WHERE e > 21500000)
      SELECT doc_id, MIN(w) AS start_win,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(e) AS BIGINT) AS seg_energy
      FROM act GROUP BY doc_id, grp
      ORDER BY doc_id, start_win""")),

    // perceptual AUDIO near-dup: multi-amplitude WAV renditions ->
    // real javax.sound decode -> 64-bit energy-delta fingerprint ->
    // the m05 band-blocked Hamming pipeline. The oracle derives every
    // fingerprint from the closed-form window-step generator (energy
    // comparisons reduce to step comparisons — amp^2 scales uniformly)
    // and reproduces the band join + Hamming verify in SQL; minHamming
    // = 1 keeps the planted PERTURBED renditions and drops the
    // unbounded identical-fingerprint cliques, exactly like m05
    ("m07_audio_neardup", (s: SparkSession, d: String) => {
      val hashed = Multimodal.audioFingerprint64(
        Multimodal.syntheticAudioRenditions(t(s, d, "documents")))
      Dedup.fingerprintNearDup(hashed.select(col("doc_id"), col("fp")),
        minHamming = 1, maxHamming = 4, maxBucket = Int.MaxValue)
    }, Some {
      val aStep = "100 + (" + Hashing.h32Sql(
        s"CAST(pn.p*${Multimodal.AudioWindows} + w.w AS VARCHAR)") + " % 900)"
      s"""
      WITH d AS (SELECT doc_id,
              CAST(doc_id % ${Multimodal.AudioPatterns} AS BIGINT) AS p,
              (doc_id % ${Multimodal.NoiseEvery} = 0) AS noisy FROM documents),
      pn AS (SELECT DISTINCT p, noisy FROM d),
      aw AS (SELECT pn.p, pn.noisy, w.w,
              CASE WHEN pn.noisy AND w.w = (pn.p % 64) + 1
                   THEN ($aStep) + 1000 ELSE ($aStep) END AS a
             FROM pn CROSS JOIN range(${Multimodal.AudioWindows}) w(w)),
      fp0 AS (SELECT a1.p, a1.noisy,
              CAST(SUM(CASE WHEN a2.a <= a1.a THEN CAST(0 AS BIGINT)
                       WHEN a1.w = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                       ELSE (CAST(1 AS BIGINT) << CAST(a1.w AS INT)) END)
                AS BIGINT) AS fp
              FROM aw a1 JOIN aw a2 ON a1.p = a2.p AND a1.noisy = a2.noisy
               AND a2.w = a1.w + 1
              WHERE a1.w < 64 GROUP BY a1.p, a1.noisy),
      hd AS (SELECT d.doc_id, fp0.fp FROM d
             JOIN fp0 ON d.p = fp0.p AND d.noisy = fp0.noisy)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
      FROM hd a JOIN hd b ON a.doc_id < b.doc_id
       AND ((a.fp & 65535) = (b.fp & 65535) OR
            ((a.fp >> 16) & 65535) = ((b.fp >> 16) & 65535) OR
            ((a.fp >> 32) & 65535) = ((b.fp >> 32) & 65535) OR
            ((a.fp >> 48) & 65535) = ((b.fp >> 48) & 65535))
      WHERE bit_count(xor(a.fp, b.fp)) BETWEEN 1 AND 4
      ORDER BY doc_a, doc_b"""
    }),

    // video near-dup via sampled-frame fingerprints: REAL length-
    // prefixed PNG-frame containers (demux + decode + shared dHash
    // grid), every 3rd of 12 frames sampled, near-dup = pairs agreeing
    // on >= 3 sampled (frame_idx, dhash) — re-encodes at other
    // resolutions match exactly (grid invariance), the one perturbed
    // frame in rendition 1 costs one agreement. Oracle recomputes the
    // frame hashes analytically from the closed-form cell rule, so the
    // whole demux/decode/hash path is value-verified
    ("m08_video_neardup", (s: SparkSession, d: String) => {
      val vids = Multimodal.syntheticVideos(
        t(s, d, "documents").filter(col("doc_id") < 600))
      Multimodal.videoFrameDup(vids, sampleEvery = 3, minMatches = 3)
    }, Some {
      s"""
      WITH d AS (SELECT doc_id, doc_id // 2 AS vid, CAST(doc_id % 2 AS INT) AS r
                 FROM documents WHERE doc_id < 600),
      fr AS (SELECT doc_id, j.j AS frame_idx,
                    CAST((vid + j.j) % ${Multimodal.PatternCount} AS BIGINT) AS p,
                    (r = 1 AND j.j = vid % ${Multimodal.VideoFrames}) AS noisy
             FROM d CROSS JOIN range(${Multimodal.VideoFrames}) j(j)
             WHERE j.j % 3 = 0),
      pn AS (SELECT DISTINCT p, noisy FROM fr),
      $patternCellsHhCtes,
      fp AS (SELECT fr.doc_id, fr.frame_idx, hh.dhash FROM fr
             JOIN hh ON hh.p = fr.p AND hh.noisy = fr.noisy),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_matches
            FROM fp a JOIN fp b ON a.frame_idx = b.frame_idx
              AND a.dhash = b.dhash AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_matches FROM m WHERE n_matches >= 3
      ORDER BY doc_a, doc_b"""
    }),

    // ---- within-video keyframe selection: dHash change between
    // consecutive frames == shot boundary; only keyframes would reach
    // the expensive frame encoder downstream. Oracle recomputes every
    // frame hash analytically from the shot-pattern model and applies
    // the same LAG ---------------------------------------------------
    ("m09_keyframes", (s: SparkSession, d: String) => {
      val vids = Multimodal.syntheticShotVideos(
        t(s, d, "documents").filter(col("doc_id") < 600))
      Multimodal.keyframes(vids, sampleEvery = 1)
    }, Some {
      s"""
      WITH d AS (SELECT doc_id, doc_id // 2 AS vid
                 FROM documents WHERE doc_id < 600),
      fr AS (SELECT doc_id, j.j AS frame_idx,
                    CAST((vid + j.j // 4) % ${Multimodal.PatternCount} AS BIGINT) AS p,
                    FALSE AS noisy
             FROM d CROSS JOIN range(${Multimodal.VideoFrames}) j(j)),
      pn AS (SELECT DISTINCT p, noisy FROM fr),
      $patternCellsHhCtes,
      fp AS (SELECT fr.doc_id, fr.frame_idx, hh.dhash FROM fr
             JOIN hh ON hh.p = fr.p AND hh.noisy = fr.noisy),
      k AS (SELECT doc_id, frame_idx, dhash,
              LAG(dhash) OVER (PARTITION BY doc_id
                ORDER BY frame_idx) AS prev
            FROM fp)
      SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, dhash
      FROM k WHERE prev IS NULL OR prev <> dhash
      ORDER BY doc_id, frame_idx"""
    }),

    // ---- streaming window workload, batch form -------------------------
    // (the true readStream variants live in graft.streaming and are
    // exercised by ScalaTest; semantics here are identical)

    ("w01_tumbling_window", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"),
                col("window.end").as("window_end"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""")),

    ("w02_sliding_window", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
                col("window.end").as("window_end"),
                col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }, Some("""
      WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS wb, event_type FROM events),
      u AS (SELECT wb AS window_start, event_type FROM b
            UNION ALL
            SELECT wb - INTERVAL '30 minutes' AS window_start, event_type FROM b)
      SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
             event_type, COUNT(*) AS n
      FROM u GROUP BY 1, 2, 3 ORDER BY window_start, event_type""")),

    // batch twin of the watermarked stream-stream interval join
    // (EventStreams.attributionJoin; the streaming form is spec-checked
    // row-identical to this)
    ("w06_attribution_join", (s: SparkSession, d: String) => {
      graft.streaming.EventStreams
        .attributionJoin(t(s, d, "events"), windowMinutes = 30)
        .orderBy(col("purchase_id"), col("click_id"))
    }, Some("""
      SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
             c.event_id AS click_id, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
      ORDER BY purchase_id, click_id""")),

    // mergeable bottom-k-by-hash quantile sketch over hourly event
    // values (the rank twin of d18's HLL merge proof): estimates from a
    // bounded uniform sample, and the KMV merge identity — sketch
    // rebuilt from parity halves == direct sketch — asserted as a VALUE
    ("w08_quantile_sketch", (s: SparkSession, d: String) =>
      Dedup.quantileSketchMerge(t(s, d, "events"), k = 64),
      Some(s"""
      WITH rows_ AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS hour,
                            event_id, value,
                            ${Hashing.h32Sql("CAST(event_id AS VARCHAR)")} AS h
                     FROM events WHERE value IS NOT NULL),
      dsmp AS (SELECT hour, event_id, value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY hour
                             ORDER BY h, event_id) AS rn
                 FROM rows_) WHERE rn <= 64),
      psmp AS (SELECT hour, event_id, h, value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY hour, event_id % 2
                             ORDER BY h, event_id) AS rn
                 FROM rows_) WHERE rn <= 64),
      msmp AS (SELECT hour, event_id, value FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY hour
                             ORDER BY h, event_id) AS rn
                 FROM psmp) WHERE rn <= 64),
      dq AS (SELECT hour, CAST(MAX(m) AS BIGINT) AS m,
                    MAX(CASE WHEN vr = (m + 1) // 2 THEN value END) AS p50_est,
                    MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN value END) AS p90_est
             FROM (SELECT hour, value,
                          ROW_NUMBER() OVER (PARTITION BY hour
                            ORDER BY value, event_id) AS vr,
                          COUNT(*) OVER (PARTITION BY hour) AS m
                   FROM dsmp) GROUP BY hour),
      mq AS (SELECT hour,
                    MAX(CASE WHEN vr = (m + 1) // 2 THEN value END) AS p50_merged,
                    MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN value END) AS p90_merged
             FROM (SELECT hour, value,
                          ROW_NUMBER() OVER (PARTITION BY hour
                            ORDER BY value, event_id) AS vr,
                          COUNT(*) OVER (PARTITION BY hour) AS m
                   FROM msmp) GROUP BY hour)
      SELECT dq.hour, dq.m, dq.p50_est, dq.p90_est,
             mq.p50_merged, mq.p90_merged,
             (dq.p50_est = mq.p50_merged AND dq.p90_est = mq.p90_merged)
               AS merge_exact
      FROM dq JOIN mq USING (hour) ORDER BY hour""")),

    // salted skew join as a REGISTERED query: 30% of events collapse
    // onto one hot user (the pathological single-hot-key case AQE
    // splits poorly), the per-user dim explodes to every salt, the join
    // is a forced shuffle-hash equi-join on (u_key, __salt) — so the
    // skewed key's rows spread across `salts` partitions instead of one
    // straggler task. The salt values come from murmur hash (engine-
    // internal, not portable) but never reach the result: the oracle is
    // the plain join. PlanGuardSpec asserts the salt-explode shape.
    ("w14_skew_salted_join", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
      val sk = ev.select(
        when(col("event_id") % 10 < 3, lit(0L))
          .otherwise(col("user_id")).as("u_key"),
        col("event_type"), col("event_id"))
      val dim = ev.groupBy(col("user_id").as("u_key"))
        .agg(count(lit(1)).as("u_events"))
      Layout.saltedJoin(sk, dim.hint("shuffle_hash"), "u_key",
          salts = 8, entropyCol = "event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("u_events")).as("sum_u_events"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH sk AS (SELECT CASE WHEN event_id % 10 < 3 THEN 0 ELSE user_id END AS u_key,
                         event_type FROM events),
      dim AS (SELECT user_id AS u_key, COUNT(*) AS u_events
              FROM events GROUP BY user_id)
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(u_events) AS BIGINT) AS sum_u_events
      FROM sk JOIN dim USING (u_key)
      GROUP BY event_type ORDER BY event_type""")),

    ("w03_session_window", (s: SparkSession, d: String) => {
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
                col("session_window.start").as("session_start"),
                col("session_window.end").as("session_end"),
                col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }, Some("""
      WITH o AS (SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS is_new
           FROM events),
      s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o)
      SELECT user_id, MIN(ts) AS session_start,
             MAX(ts) + INTERVAL '10 minutes' AS session_end,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    // ---- shard-balance Gini over the c13 byte-budget plan: exact
    // sorted-rank identity, BIGINT num/denom, one division — the
    // straggler-risk scalar for any sharding layout ------------------
    ("c28_shard_gini", (s: SparkSession, d: String) => {
      import graft.operators.PrefixSum
      val planned = PrefixSum.withRunningSum(
        t(s, d, "documents").select(col("doc_id"), col("n_chars")),
        Seq(col("doc_id")), "n_chars", "start")
      val shards = planned.withColumn("shard_id", expr("start div 16384"))
        .groupBy(col("shard_id"))
        .agg(sum(col("n_chars")).as("sz"))
      Curation.shardGini(shards, "sz")
    }, Some("""
      WITH c AS (SELECT doc_id, n_chars,
                   COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS start
                 FROM documents),
      sh AS (SELECT start // 16384 AS shard_id,
                    CAST(SUM(n_chars) AS BIGINT) AS sz
             FROM c GROUP BY 1),
      r AS (SELECT sz,
              ROW_NUMBER() OVER (ORDER BY sz, shard_id) AS i,
              COUNT(*) OVER () AS n,
              SUM(sz) OVER () AS tot
            FROM sh)
      SELECT CAST(MAX(n) AS BIGINT) AS n_shards,
             CAST(MAX(tot) AS BIGINT) AS total_chars,
             CAST(SUM((2 * i - n - 1) * sz) AS DOUBLE)
               / CAST(MAX(n) * MAX(tot) AS DOUBLE) AS gini
      FROM r""")),

    // ---- IPF / raking to two marginals (Deming & Stephan 1940):
    // alternating integer rescales w' = w * target // marginal_sum in
    // u20 fixed point; oracle unrolls the identical recurrence ------
    ("c27_ipf_raking", (s: SparkSession, d: String) =>
      Curation.ipfRaking(t(s, d, "documents")),
      Some {
        val rounds = (1 to 2).map { r =>
          s"""l$r AS (SELECT lang, SUM(w) AS c FROM w${2 * r - 2} GROUP BY lang),
      w${2 * r - 1} AS (SELECT doc_id, q.lang, q.source, q.w * tl // c AS w
             FROM w${2 * r - 2} q JOIN l$r USING (lang) CROSS JOIN t),
      s$r AS (SELECT source, SUM(w) AS c FROM w${2 * r - 1} GROUP BY source),
      w${2 * r} AS (SELECT doc_id, q.lang, q.source, q.w * ts_ // c AS w
             FROM w${2 * r - 1} q JOIN s$r USING (source) CROSS JOIN t)"""
        }.mkString(",\n      ")
        s"""
      WITH d AS (SELECT doc_id, lang, source FROM documents),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
                    CAST(COUNT(DISTINCT source) AS BIGINT) AS ns FROM d),
      t AS (SELECT n * 1048576 // nl AS tl, n * 1048576 // ns AS ts_
            FROM nn),
      w0 AS (SELECT doc_id, lang, source, CAST(1048576 AS BIGINT) AS w
             FROM d),
      $rounds
      SELECT doc_id, CAST(w AS BIGINT) AS weight_u20
      FROM w4 ORDER BY doc_id"""
      }),

    // ---- add-one-smoothed conditional bigram LM score (the CCNet/
    // KenLM perplexity-filter shape): each p(w2|w1) is one IEEE
    // division of exact integer counts, floor-quantized at 2^40 and
    // integer-summed (the t15 discipline — no libm log) -------------
    ("t27_bigram_lm", (s: SparkSession, d: String) =>
      TextAnalysis.bigramLmScore(t(s, d, "documents")),
      Some(s"""
      WITH uni AS (SELECT unnest(${TextOps.wordsSql("text")}) AS w
                   FROM documents),
      uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY w),
      v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM uni),
      bi AS (SELECT doc_id,
                    unnest(${TextOps.allWordShinglesSql("text", 2)}) AS bigram
             FROM documents),
      bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12
             FROM bi GROUP BY bigram),
      f AS (SELECT doc_id,
                   CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE) AS p
            FROM bi JOIN bc USING (bigram)
            JOIN uc ON uc.w = string_split(bigram, ' ')[1]
            CROSS JOIN v)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(floor(p * CAST(1099511627776 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS lm_score
      FROM f GROUP BY doc_id ORDER BY doc_id""")),

    // ---- readability profile: Flesch reading ease with a vowel-group
    // syllable proxy + type-token ratio; pure narrow projection, the
    // polynomial evaluated in ONE fixed association order ------------
    ("t28_readability", (s: SparkSession, d: String) =>
      TextAnalysis.readability(t(s, d, "documents")),
      Some(s"""
      WITH r AS (SELECT doc_id,
          CAST(len(${TextOps.wordsSql("text")}) AS BIGINT) AS n_words,
          CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_syllables,
          GREATEST(CAST(1 AS BIGINT),
            CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)) AS n_sentences,
          CAST(len(list_distinct(${TextOps.wordsSql("text")})) AS BIGINT) AS nd
        FROM documents)
      SELECT doc_id, n_words, n_syllables, n_sentences,
        CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS words_per_sentence,
        CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS syllables_per_word,
        CAST(206.835 AS DOUBLE)
          - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) AS flesch,
        CAST(nd AS DOUBLE) / CAST(n_words AS DOUBLE) AS ttr
      FROM r ORDER BY doc_id""")),

    // ---- RAKE keyword extraction: stopword-free phrase islands, word
    // score deg/freq floor-quantized at 2^40, phrase score = sum over
    // its words (unique phrases scored once; word stats count every
    // occurrence, as in Rose et al. 2010) ---------------------------
    ("t29_rake_keywords", (s: SparkSession, d: String) =>
      TextAnalysis.rakeKeywords(t(s, d, "documents")),
      Some(s"""
      WITH toks AS (SELECT doc_id,
          unnest(list_transform(range(len(${TextOps.wordsSql("text")})),
            i -> struct_pack(pos := i, tok := ${TextOps.wordsSql("text")}[i + 1]))) AS s
        FROM documents),
      t2 AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.tok AS tok,
                    s.tok NOT IN ('a', 'the') AS keep
             FROM toks),
      g AS (SELECT doc_id, pos, tok, keep,
              pos - SUM(CASE WHEN keep THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM t2),
      ph AS (SELECT string_agg(tok, ' ' ORDER BY pos) AS phrase,
                    CAST(COUNT(*) AS BIGINT) AS plen
             FROM g WHERE keep GROUP BY doc_id, grp),
      wstat AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS freq,
                       CAST(SUM(plen) AS BIGINT) AS deg
                FROM (SELECT unnest(string_split(phrase, ' ')) AS w1, plen
                      FROM ph) GROUP BY w1),
      wsc AS (SELECT w1,
                CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
                  * CAST(1099511627776 AS DOUBLE)) AS BIGINT) AS wscore
              FROM wstat),
      ps AS (SELECT phrase, SUM(wscore) AS q
             FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w1
                   FROM (SELECT DISTINCT phrase FROM ph))
             JOIN wsc USING (w1) GROUP BY phrase)
      SELECT phrase, CAST(q AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS score
      FROM ps ORDER BY score DESC, phrase LIMIT 10""")),

    // ---- Gopher rule filter: keep/drop verdict + sorted failed-rule
    // reasons, every threshold cross-multiplied to integers ----------
    ("c26_gopher_rules", (s: SparkSession, d: String) =>
      TextAnalysis.gopherRules(t(s, d, "documents")),
      Some(s"""
      WITH r AS (SELECT doc_id, ${TextOps.wordsSql("text")} AS ws, text
                 FROM documents),
      s AS (SELECT doc_id,
              CAST(len(ws) AS BIGINT) AS n_words,
              CAST(length(text) - len(ws) + 1 AS BIGINT) AS n_word_chars,
              CAST(len(list_filter(ws, t -> t IN ('a', 'the'))) AS BIGINT) AS n_stops,
              CAST(list_max(list_transform(list_distinct(ws),
                t -> len(list_filter(ws, x -> x = t)))) AS BIGINT) AS top_word_n
            FROM r),
      f AS (SELECT *, COALESCE(array_to_string(list_sort(list_filter([
              CASE WHEN n_words < 20 THEN 'too_short' END,
              CASE WHEN n_words > 90 THEN 'too_long' END,
              CASE WHEN n_word_chars < n_words * 3 THEN 'words_too_short' END,
              CASE WHEN n_word_chars > n_words * 10 THEN 'words_too_long' END,
              CASE WHEN n_stops < 2 THEN 'no_stopwords' END,
              CASE WHEN top_word_n * 5 > n_words THEN 'dominant_word' END],
              x -> x IS NOT NULL)), ','), '') AS reasons
            FROM s)
      SELECT doc_id, n_words, n_word_chars, n_stops, top_word_n, reasons,
             reasons = '' AS kept
      FROM f ORDER BY doc_id""")),

    // ---- systematic weighted resampling with replacement: the
    // particle-filter low-variance resampler over the n_chars weight
    // line; probes at floor((2i+1)W/2n), draws read off interval
    // containment against the distributed prefix sum ----------------
    // Benford first-digit audit of lineitem prices: digit from the
    // EXACT cents integer; the nine log10(1+1/d) reference probs are
    // shortest-roundtrip literals parsed identically by both engines
    // (a runtime log10 could differ by an ulp between libms) ---------
    ("c31_benford", (s: SparkSession, d: String) =>
      Curation.benfordAudit(t(s, d, "lineitem"), col("l_extendedprice")),
      Some("""
      WITH g AS (SELECT CAST(substr(CAST(
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM lineitem
             WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
               AS BIGINT) > 0
             GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM g),
      ref AS (SELECT * FROM (VALUES
        (1, 0.3010299956639812), (2, 0.17609125905568124),
        (3, 0.12493873660829992), (4, 0.09691001300805642),
        (5, 0.07918124604762482), (6, 0.06694678963061322),
        (7, 0.05799194697768673), (8, 0.05115252244738129),
        (9, 0.04575749056067514)) AS t(digit, benford_p))
      SELECT ref.digit, COALESCE(g.n, 0) AS n,
             CAST(COALESCE(g.n, 0) AS DOUBLE) / CAST(tot.nn AS DOUBLE)
               AS share,
             ref.benford_p,
             ABS(CAST(COALESCE(g.n, 0) AS DOUBLE)
               / CAST(tot.nn AS DOUBLE) - ref.benford_p) AS abs_gap
      FROM ref LEFT JOIN g ON g.digit = ref.digit, tot
      ORDER BY ref.digit""")),

    // ---- Pareto-frontier (skyline) selection on (length, lexical
    // diversity): docs no other doc beats on BOTH axes — duplicates
    // collapse, then ONE range-partitioned exclusive running max over
    // (x desc, y desc) replaces the pairwise dominance join; oracle is
    // the scheme-blind NOT EXISTS dominance definition ---------------
    ("c32_skyline_select", (s: SparkSession, d: String) =>
      Curation.skylineSelect(t(s, d, "documents")),
      Some("""
      WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                 AS y
             FROM documents)
      SELECT a.doc_id, a.x AS n_chars, a.y AS n_distinct_words
      FROM m a
      WHERE NOT EXISTS (SELECT 1 FROM m b
        WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
      ORDER BY a.doc_id""")),

    // ---- distinct l-diversity audit: quasi-identifier (lang,
    // len_band) groups seen by < l distinct SOURCES — the sensitive-
    // attribute leak k-anonymity (c24) can't see -------------------
    ("c33_l_diversity", (s: SparkSession, d: String) =>
      Curation.lDiversityAudit(t(s, d, "documents"), l = 18),
      Some("""
      SELECT lang, CAST(n_chars // 256 AS BIGINT) AS len_band,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_distinct_sources,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM documents
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT source) < 18
      ORDER BY lang, len_band""")),

    // ---- Deequ-style constraint audit: completeness / pk-uniqueness
    // / range / domain checks folded into ONE aggregation pass over
    // lineitem plus one left-anti referential check vs orders;
    // violation counts, not booleans, so a gate can alert on rates ---
    ("c34_constraint_audit", (s: SparkSession, d: String) =>
      Validate.constraintAudit(t(s, d, "lineitem"), t(s, d, "orders")),
      Some("""
      WITH a AS (SELECT
          CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS c_complete,
          CAST(COUNT(*) - COUNT(DISTINCT
            concat_ws('|', l_orderkey, l_linenumber)) AS BIGINT) AS c_unique,
          CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
            THEN 1 ELSE 0 END) AS BIGINT) AS c_range,
          CAST(SUM(CASE WHEN l_extendedprice < 0.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS c_nonneg,
          CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
            THEN 1 ELSE 0 END) AS BIGINT) AS c_dom_flag,
          CAST(SUM(CASE WHEN l_linestatus NOT IN ('O', 'F')
            THEN 1 ELSE 0 END) AS BIGINT) AS c_dom_status
        FROM lineitem),
      fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_fk FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)),
      u AS (SELECT 'complete_l_returnflag' AS check_name,
                   c_complete AS violations FROM a
        UNION ALL SELECT 'unique_pk', c_unique FROM a
        UNION ALL SELECT 'range_l_quantity_1_50', c_range FROM a
        UNION ALL SELECT 'nonneg_l_extendedprice', c_nonneg FROM a
        UNION ALL SELECT 'domain_l_returnflag', c_dom_flag FROM a
        UNION ALL SELECT 'domain_l_linestatus', c_dom_status FROM a
        UNION ALL SELECT 'fk_orders', c_fk FROM fk)
      SELECT check_name, violations, violations = 0 AS passed
      FROM u ORDER BY check_name""")),

    // ---- t-closeness audit (Li et al. 2007): the distributional
    // member completing the c24/c33 privacy triad — classes whose
    // SOURCE distribution diverges from the table's by total variation
    // > 2/5, as exact cross-multiplied integers; absent-value mass is
    // folded in algebraically (nc*N + per-cell adjustment), so neither
    // engine materializes the domain cross join ----------------------
    ("c35_t_closeness", (s: SparkSession, d: String) =>
      Curation.tClosenessAudit(t(s, d, "documents"), tNum = 2, tDen = 5),
      Some("""
      WITH base AS (SELECT lang, CAST(n_chars // 256 AS BIGINT) AS len_band,
                           source FROM documents),
      cell AS (SELECT lang, len_band, source,
                      CAST(COUNT(*) AS BIGINT) AS ncv
               FROM base GROUP BY 1, 2, 3),
      ncls AS (SELECT lang, len_band, CAST(SUM(ncv) AS BIGINT) AS nc
               FROM cell GROUP BY 1, 2),
      gh AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
             FROM base GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
      terms AS (SELECT c.lang, c.len_band, n.nc, t.nn,
                  ABS(c.ncv * t.nn - g.nv * n.nc) - g.nv * n.nc AS term
                FROM cell c JOIN gh g USING (source)
                JOIN ncls n ON n.lang = c.lang AND n.len_band = c.len_band,
                tot t),
      res AS (SELECT lang, len_band, nc AS n_rows,
                CAST(nc * nn + SUM(term) AS BIGINT) AS tv_num,
                CAST(2 * nc * nn AS BIGINT) AS tv_den
              FROM terms GROUP BY lang, len_band, nc, nn)
      SELECT lang, len_band, n_rows, tv_num, tv_den,
             CAST(tv_num AS DOUBLE) / CAST(tv_den AS DOUBLE) AS t_closeness
      FROM res WHERE tv_num * 5 > tv_den * 2
      ORDER BY lang, len_band""")),

    // ---- peak-concurrency record audit: sweep line over half-open
    // activity intervals; every instant that sets a new all-time
    // concurrency record. Engine side replaces the classic single-task
    // SUM-OVER sweep with two range-partitioned prefix passes
    // (PrefixSum.withRunningSum + withRunningMax); oracle IS the
    // single-task classic, blind to the scheme ---------------------
    ("w36_concurrency_records", (s: SparkSession, d: String) =>
      TimeSeries.concurrencyRecords(t(s, d, "events")),
      Some("""
      WITH e AS (SELECT event_id, epoch_us(ts) AS s,
              epoch_us(ts) +
                (CAST(floor(value * 60) AS BIGINT) + 1) * 1000000 AS en
            FROM events),
      sweep AS (
        SELECT s AS t, CAST(1 AS BIGINT) AS d, event_id FROM e
        UNION ALL
        SELECT en, CAST(-1 AS BIGINT), event_id FROM e),
      r AS (SELECT t, d, event_id,
              SUM(d) OVER (ORDER BY t, d, event_id
                ROWS UNBOUNDED PRECEDING) AS conc
            FROM sweep),
      m AS (SELECT t, conc,
              MAX(conc) OVER (ORDER BY t, d, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
            FROM r)
      SELECT t AS ts_us, CAST(conc AS BIGINT) AS concurrency
      FROM m WHERE hw IS NULL OR conc > hw
      ORDER BY ts_us""")),

    ("c30_systematic_resample", (s: SparkSession, d: String) =>
      Curation.systematicResample(t(s, d, "documents"), "n_chars", n = 20),
      Some("""
      WITH wd AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
                  FROM documents),
      cum AS (SELECT doc_id, w,
                COALESCE(SUM(w) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cum_lo
              FROM wd),
      tot AS (SELECT SUM(w) AS wt FROM wd),
      probes AS (SELECT CAST(i AS INT) AS probe,
                   CAST((2*i + 1) * wt // 40 AS BIGINT) AS pos
                 FROM range(20) t(i), tot)
      SELECT p.probe, p.pos, c.doc_id, c.w AS weight
      FROM probes p JOIN cum c
        ON p.pos >= c.cum_lo AND p.pos < c.cum_lo + c.w
      ORDER BY probe""")),

    // ---- greedy maximum-coverage selection (facility-location data
    // selection): k rounds, each picking the doc covering the most
    // not-yet-covered distinct tokens; oracle unrolls the identical
    // greedy rounds with MATERIALIZED CTEs --------------------------
    ("c29_maxcover_select", (s: SparkSession, d: String) =>
      Curation.maxCoverSelect(t(s, d, "documents"), k = 4),
      Some(s"""
      WITH tok AS MATERIALIZED (SELECT doc_id,
          unnest(${graft.ext.TextOps.wordShinglesSql("text", 2)}) AS w
        FROM documents),
      g1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
             FROM tok GROUP BY 1),
      w1 AS MATERIALIZED (SELECT doc_id, gain FROM g1
             ORDER BY gain DESC, doc_id LIMIT 1),
      c1 AS MATERIALIZED (SELECT DISTINCT w FROM tok
             WHERE doc_id IN (SELECT doc_id FROM w1)),
      g2 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM tok
             WHERE doc_id NOT IN (SELECT doc_id FROM w1)
               AND w NOT IN (SELECT w FROM c1) GROUP BY 1),
      w2 AS MATERIALIZED (SELECT doc_id, gain FROM g2
             ORDER BY gain DESC, doc_id LIMIT 1),
      c2 AS MATERIALIZED (SELECT DISTINCT w FROM tok
             WHERE doc_id IN (SELECT doc_id FROM w1
                              UNION SELECT doc_id FROM w2)),
      g3 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM tok
             WHERE doc_id NOT IN (SELECT doc_id FROM w1
                                  UNION SELECT doc_id FROM w2)
               AND w NOT IN (SELECT w FROM c2) GROUP BY 1),
      w3 AS MATERIALIZED (SELECT doc_id, gain FROM g3
             ORDER BY gain DESC, doc_id LIMIT 1),
      c3 AS MATERIALIZED (SELECT DISTINCT w FROM tok
             WHERE doc_id IN (SELECT doc_id FROM w1
                              UNION SELECT doc_id FROM w2
                              UNION SELECT doc_id FROM w3)),
      g4 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain FROM tok
             WHERE doc_id NOT IN (SELECT doc_id FROM w1
                                  UNION SELECT doc_id FROM w2
                                  UNION SELECT doc_id FROM w3)
               AND w NOT IN (SELECT w FROM c3) GROUP BY 1),
      w4 AS MATERIALIZED (SELECT doc_id, gain FROM g4
             ORDER BY gain DESC, doc_id LIMIT 1),
      c4 AS MATERIALIZED (SELECT DISTINCT w FROM tok
             WHERE doc_id IN (SELECT doc_id FROM w1
                              UNION SELECT doc_id FROM w2
                              UNION SELECT doc_id FROM w3
                              UNION SELECT doc_id FROM w4))
      SELECT CAST(1 AS INT) AS round, doc_id, gain,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c1) AS covered_total
        FROM w1
      UNION ALL SELECT 2, doc_id, gain,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c2) FROM w2
      UNION ALL SELECT 3, doc_id, gain,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c3) FROM w3
      UNION ALL SELECT 4, doc_id, gain,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c4) FROM w4
      ORDER BY round""")),

    // ---- encoding-corruption audit over a deterministically PLANTED
    // double-encoding (the m03/m14 synthetic discipline for text):
    // docs in the 3-mod-7 class get 'e' -> 'Ã©' (byte-identical to the
    // UTF-8-read-as-Latin-1 accident on an ASCII corpus); the audit
    // counts every marker signature by the exact length-difference
    // identity and rolls up per source ------------------------------
    ("t35_encoding_audit", (s: SparkSession, d: String) =>
      TextAnalysis.encodingAudit(
        TextAnalysis.mojibakeCorrupt(t(s, d, "documents"))),
      Some("""
      WITH c AS (SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 3
                    THEN replace(text, 'e', 'Ã©') ELSE text END AS text
             FROM documents),
      p AS (SELECT source,
              CAST(strlen(text) - length(text) AS BIGINT) AS excess,
              CAST(length(text) - length(replace(text, 'Ã', ''))
                AS BIGINT) AS utf8_latin1,
              CAST((length(text) - length(replace(text, 'â€', ''))) // 2
                AS BIGINT) AS punct_utf8,
              CAST(length(text) - length(replace(text, '�', ''))
                AS BIGINT) AS replacement,
              CAST(length(text) - length(replace(text, 'Â', ''))
                AS BIGINT) AS nbsp_latin1
            FROM c)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN utf8_latin1 > 0 OR punct_utf8 > 0
                        OR replacement > 0 OR nbsp_latin1 > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_docs,
             CAST(SUM(utf8_latin1) AS BIGINT) AS c_utf8_latin1,
             CAST(SUM(punct_utf8) AS BIGINT) AS c_punct_utf8,
             CAST(SUM(replacement) AS BIGINT) AS c_replacement,
             CAST(SUM(nbsp_latin1) AS BIGINT) AS c_nbsp_latin1,
             CAST(SUM(excess) AS BIGINT) AS excess_bytes,
             CAST(SUM(CASE WHEN utf8_latin1 > 0 OR punct_utf8 > 0
                        OR replacement > 0 OR nbsp_latin1 > 0
                      THEN 1 ELSE 0 END) * 1000000
               // COUNT(*) AS BIGINT) AS bad_ppm
      FROM p GROUP BY source ORDER BY source""")),

    // ---- cross-user interval-overlap join via bucket decomposition:
    // the range-join-to-equi-join rewrite (fixed 60 s buckets, fan-out
    // <= 3 rows/interval at the fixture's <= 61 s durations), each
    // overlapping pair counted once by the canonical bucket holding
    // max(s_a, s_b) — no distinct, no theta join. Oracle IS the brute
    // theta join, blind to the bucketing -----------------------------
    ("w44_interval_overlap", (s: SparkSession, d: String) =>
      TimeSeries.intervalOverlap(t(s, d, "events")),
      Some("""
      WITH iv AS (SELECT event_id, user_id, epoch_us(ts) AS s,
              epoch_us(ts) +
                (CAST(floor(value * 60) AS BIGINT) + 1) * 1000000 AS e
            FROM events WHERE user_id < 30)
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS BIGINT)
               AS overlap_us
      FROM iv a JOIN iv b
        ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
      GROUP BY 1, 2 ORDER BY user_a, user_b""")),

    // ---- k-means Lloyd refinement in exact fixed-point: the
    // production centroid-training step the IVF family's first-k seed
    // defers. 2 Lloyd rounds from the deterministic lowest-16 seed;
    // assignments, truncating-div centroid means, and the final cell
    // sizes all exact integers, so the oracle unrolls the identical
    // trajectory round for round -----------------------------------
    ("s39_kmeans_lloyd", (s: SparkSession, d: String) =>
      Similarity.kmeansLloyd(t(s, d, "embeddings"), k = 16, rounds = 2),
      Some("""
      WITH g AS (SELECT vec_id, embedding,
                   unnest(range(len(embedding))) AS pos FROM embeddings),
      qd AS MATERIALIZED (SELECT vec_id, CAST(pos AS INT) AS pos,
              CAST(floor(CAST(embedding[pos + 1] AS DOUBLE) * 1024)
                AS BIGINT) AS x
            FROM g),
      c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                 AS c_id, vec_id
             FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      cd0 AS MATERIALIZED (SELECT c0.c_id, qd.pos, qd.x AS c
             FROM c0 JOIN qd ON qd.vec_id = c0.vec_id),
      d1 AS (SELECT q.vec_id, c.c_id,
               SUM((q.x - c.c) * (q.x - c.c)) AS dist
             FROM qd q JOIN cd0 c ON c.pos = q.pos GROUP BY 1, 2),
      a1 AS MATERIALIZED (SELECT vec_id, c_id AS cell FROM
             (SELECT vec_id, c_id, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dist, c_id) AS rn FROM d1) z WHERE rn = 1),
      s1 AS (SELECT a.cell, q.pos, SUM(q.x) AS s, COUNT(*) AS n
             FROM a1 a JOIN qd q USING (vec_id) GROUP BY 1, 2),
      cd1 AS MATERIALIZED (SELECT p.c_id, p.pos,
               COALESCE(s.s // s.n, p.c) AS c
             FROM cd0 p LEFT JOIN s1 s
               ON s.cell = p.c_id AND s.pos = p.pos),
      d2 AS (SELECT q.vec_id, c.c_id,
               SUM((q.x - c.c) * (q.x - c.c)) AS dist
             FROM qd q JOIN cd1 c ON c.pos = q.pos GROUP BY 1, 2),
      a2 AS MATERIALIZED (SELECT vec_id, c_id AS cell FROM
             (SELECT vec_id, c_id, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dist, c_id) AS rn FROM d2) z WHERE rn = 1),
      s2 AS (SELECT a.cell, q.pos, SUM(q.x) AS s, COUNT(*) AS n
             FROM a2 a JOIN qd q USING (vec_id) GROUP BY 1, 2),
      cd2 AS MATERIALIZED (SELECT p.c_id, p.pos,
               COALESCE(s.s // s.n, p.c) AS c
             FROM cd1 p LEFT JOIN s2 s
               ON s.cell = p.c_id AND s.pos = p.pos),
      d3 AS (SELECT q.vec_id, c.c_id,
               SUM((q.x - c.c) * (q.x - c.c)) AS dist
             FROM qd q JOIN cd2 c ON c.pos = q.pos GROUP BY 1, 2),
      a3 AS (SELECT vec_id, c_id AS cell FROM
             (SELECT vec_id, c_id, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY dist, c_id) AS rn FROM d3) z WHERE rn = 1),
      m AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members
            FROM a3 GROUP BY 1)
      SELECT c.c_id, c.pos, CAST(c.c AS BIGINT) AS c_val,
             COALESCE(m.n_members, 0) AS n_members
      FROM cd2 c LEFT JOIN m ON m.cell = c.c_id
      ORDER BY c_id, pos""")),

    // ---- compression-ratio quality filter over a deterministic
    // two-class plant (the m14 lossy-codec discipline for DEFLATE):
    // even docs are pure repetition (must band < 1/4), odd docs are
    // md5-chain pseudo-random hex (must band > 2/5); raw lengths are
    // analytic, the band booleans are the engine-computed contract a
    // zlib regression would flip -----------------------------------
    ("t36_compress_ratio", (s: SparkSession, d: String) => {
      val base = t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          (col("doc_id") % 2 === 0).as("repetitive"),
          when(col("doc_id") % 2 === 0,
            expr("repeat('ab', CAST(128 + (doc_id % 7) * 16 AS INT))"))
            .otherwise(expr((0 until 16).map(i =>
              s"md5(CAST(doc_id + $i AS STRING))")
              .mkString("concat(", ", ", ")")))
            .as("text"))
      TextAnalysis.deflateLengths(base)
        .join(base.select(col("doc_id"), col("repetitive")), "doc_id")
        .select(col("doc_id"), col("repetitive"), col("n_bytes"),
          when(col("repetitive"), col("n_deflate") * 4 < col("n_bytes"))
            .otherwise(col("n_deflate") * 5 > col("n_bytes") * 2)
            .as("within_band"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id, doc_id % 2 = 0 AS repetitive,
             CAST(CASE WHEN doc_id % 2 = 0
                  THEN 2 * (128 + (doc_id % 7) * 16)
                  ELSE 512 END AS BIGINT) AS n_bytes,
             TRUE AS within_band
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""")),

    // ---- concat-and-split sequence packing (the Megatron pretraining
    // layout): docs concatenate in doc_id order, fixed 256-token cuts,
    // straddling allowed and AUDITED; global offsets via the
    // range-partitioned PrefixSum, never a single-task window (the
    // oracle IS the single-task classic, blind to the scheme) --------
    ("c37_concat_packing", (s: SparkSession, d: String) =>
      Curation.concatPacking(t(s, d, "documents"), budget = 256L),
      Some("""
      WITH c AS (SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             FROM documents),
      o AS (SELECT doc_id, n_tok,
              CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS off
            FROM c),
      e AS (SELECT doc_id, n_tok, off,
              unnest(range(off // 256, (off + n_tok - 1) // 256 + 1)) AS seq
            FROM o)
      SELECT CAST(seq AS BIGINT) AS seq, CAST(COUNT(*) AS BIGINT) AS n_docs,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
             CAST(SUM(LEAST(off + n_tok, (seq + 1) * 256) -
                      GREATEST(off, seq * 256)) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN off < seq * 256 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_straddle
      FROM e GROUP BY seq ORDER BY seq""")),

    // ---- HTML/markup -> text extraction over the deterministic
    // synthetic page wrap (the t35/m03 plant discipline): script/
    // style/comment spans dropped, closing block tags segment, per
    // block link density (anchor chars vs text chars, integer pct
    // rule) + word floor decide keep/drop — nav, ads, footer and
    // title fall; both content paragraphs survive, including the one
    // with an inline anchor. Zero shuffle: one narrow projection ----
    ("t38_html_extract", (s: SparkSession, d: String) =>
      TextAnalysis.htmlExtract(TextAnalysis.htmlWrap(t(s, d, "documents"))),
      Some {
        // the engine's per-block formulas, verbatim in DuckDB terms
        def txt(x: String) =
          s"trim(regexp_replace(regexp_replace($x, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))"
        // NULL-proof: DuckDB's regexp_extract_all -> array_to_string
        // chain yields NULL (not '') on a no-anchor block
        def ach(x: String) =
          s"coalesce(length(array_to_string(regexp_extract_all($x, '<a[^>]*>([^<]*)</a>', 1), '')), 0)"
        s"""
      WITH h AS (SELECT doc_id, source,
        '<html><head><title>Doc ' || doc_id ||
        '</title><style>.nav{color:#fff}</style><script>var t="' || doc_id ||
        '";track(t);</script></head><body><div><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></div>' ||
        CASE WHEN doc_id % 5 = 2
             THEN '<div>ad <a href="/buy">buy now</a> <a href="/sub">subscribe today</a></div>'
             ELSE '' END ||
        '<p>' || text ||
        '</p><p>related reading material worth your time see <a href="/more">more like doc ' || doc_id ||
        '</a></p><!-- rendered in 3ms --><div><a href="/terms">terms</a> <a href="/privacy">privacy</a> (c) site</div></body></html>'
          AS html FROM documents),
      m AS (SELECT doc_id, source,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
          '<script[^>]*>.*?</script>', ' ', 'g'),
          '<style[^>]*>.*?</style>', ' ', 'g'),
          '<!--.*?-->', ' ', 'g'),
          '</(p|div|title|li|h1|h2|h3)>', '@@BLK@@', 'g') AS t FROM h),
      b AS (SELECT doc_id, source,
        list_filter(string_split(t, '@@BLK@@'),
          x -> length(${txt("x")}) > 0) AS blocks FROM m),
      k AS (SELECT doc_id, source, blocks,
        list_filter(blocks, x ->
          len(string_split(${txt("x")}, ' ')) >= 3
          AND ${ach("x")} * 100 <= length(${txt("x")}) * 30) AS kept
        FROM b)
      SELECT doc_id, source,
        CAST(len(blocks) AS INT) AS n_blocks,
        CAST(len(kept) AS INT) AS n_kept,
        CAST(length(array_to_string(list_transform(blocks,
          x -> ${txt("x")}), '')) AS BIGINT) AS text_chars,
        CAST(length(array_to_string(list_transform(blocks,
          x -> coalesce(array_to_string(regexp_extract_all(x,
            '<a[^>]*>([^<]*)</a>', 1), ''), '')), '')) AS BIGINT)
          AS anchor_chars,
        array_to_string(list_transform(kept, x -> ${txt("x")}), ' ')
          AS extracted
      FROM k ORDER BY doc_id"""
      }),

    // ---- WordPiece greedy longest-match APPLY over the planted
    // compound/OOV tails (t37 discipline): vocab = top-20 words +
    // their single chars; per distinct word, 12 unrolled greedy steps
    // each taking the LONGEST unit matching at the cursor; any
    // unmatched position fails the WHOLE word to [UNK]. The oracle
    // replays the identical walk step for step --------------------
    ("t39_wordpiece_apply", (s: SparkSession, d: String) =>
      TextAnalysis.wordpieceApply(
        TextAnalysis.wordpiecePlant(t(s, d, "documents"))),
      Some {
        def step(i: Int): String = s"""
        s$i AS (SELECT word, n_occurrences,
            pos + ml AS pos,
            n_units + CASE WHEN ml > 0 THEN 1 ELSE 0 END AS n_units,
            unk OR (pos < length(word) AND ml = 0) AS unk,
            CASE WHEN ml = 0 THEN pieces
                 WHEN pos = 0 THEN substr(word, 1, ml)
                 ELSE pieces || ' ##' || substr(word, pos + 1, ml)
            END AS pieces
          FROM (SELECT *, CASE WHEN NOT unk AND pos < length(word) THEN
                  COALESCE((SELECT MAX(length(u)) FROM units uu
                            WHERE substr(s${i - 1}.word, s${i - 1}.pos + 1,
                                         length(uu.u)) = uu.u), 0)
                ELSE 0 END AS ml FROM s${i - 1}))"""
        s"""
      WITH dd AS (SELECT doc_id,
          text || ' ' || CASE WHEN doc_id % 3 = 0 THEN 'joinhash'
                              WHEN doc_id % 3 = 1 THEN 'hashjoinrow'
                              ELSE 'scanqz' END AS text FROM documents),
      w AS MATERIALIZED (SELECT w AS word,
            CAST(COUNT(*) AS BIGINT) AS n_occurrences
          FROM (SELECT unnest(string_split(text, ' ')) AS w FROM dd)
          WHERE w <> '' GROUP BY w),
      top AS MATERIALIZED (SELECT word FROM w
          WHERE regexp_matches(word, '^[a-z]+${"$"}')
          ORDER BY n_occurrences DESC, word LIMIT 20),
      units AS MATERIALIZED (SELECT DISTINCT u FROM (
          SELECT word AS u FROM top
          UNION ALL
          SELECT unnest(regexp_extract_all(word, '.')) AS u FROM top)),
      s0 AS (SELECT word, n_occurrences, 0 AS pos, 0 AS n_units,
                    FALSE AS unk, '' AS pieces FROM w),
      ${(1 to 12).map(step).mkString(",\n      ")}
      SELECT word, n_occurrences, unk AS is_unk,
        CAST(CASE WHEN unk THEN 1 ELSE n_units END AS INT) AS n_units,
        CASE WHEN unk THEN '[UNK]' ELSE pieces END AS pieces
      FROM s12 ORDER BY word"""
      }),

    // ---- canonical-URL exact dedup over the same plant: two fetches
    // of one canonical URL are the same page, so URL-group collapse
    // is the cheapest duplicate class and runs before any shingling;
    // keeper = lowest doc_id, one partial-aggregable groupBy --------
    ("c39_url_dedup", (s: SparkSession, d: String) =>
      graft.ext.Curation.urlDedup(
        graft.ext.Curation.urlPlant(t(s, d, "documents"))),
      Some(s"""
      WITH $urlNormCtes
      SELECT norm_url, domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        MIN(doc_id) AS keep_doc,
        CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
      FROM n5 GROUP BY norm_url, domain HAVING COUNT(*) > 1
      ORDER BY norm_url""")),

    // ---- URL canonicalization + per-domain crawl curation over the
    // deterministic doc_id % 7 URL plant: RFC 3986 syntax
    // normalization (case, userinfo, default ports, fragments,
    // duplicate slashes, tracking params with order preserved),
    // PSL-subset registered domains, per-domain doc/url
    // counts and a >20%-share over-cap verdict ----------------------
    ("c38_url_curation", (s: SparkSession, d: String) =>
      graft.ext.Curation.urlDomainCurate(
        graft.ext.Curation.urlPlant(t(s, d, "documents"))),
      Some(s"""
      WITH $urlNormCtes,
      r AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS domain_docs,
              CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS domain_urls
            FROM n5 GROUP BY domain),
      tt AS (SELECT COUNT(*) AS tot FROM n5)
      SELECT n5.doc_id, n5.url, n5.norm_url, n5.domain,
        r.domain_docs, r.domain_urls,
        r.domain_docs * 100 > tt.tot * 20 AS over_cap
      FROM n5 JOIN r USING (domain) CROSS JOIN tt
      ORDER BY doc_id""")),

    // ---- EXIF GPS privacy audit over the closed-form header plant
    // (t11's PII discipline extended to media metadata): detect
    // GPS-bearing payloads, strip the GPS block byte-exactly, roll up
    // per source with exact before/after byte totals ---------------
    ("m15_exif_privacy", (s: SparkSession, d: String) =>
      graft.ext.Multimodal.exifPrivacyAudit(t(s, d, "documents")),
      Some("""
      WITH p AS (SELECT doc_id, source,
          CASE WHEN doc_id % 4 = 1 THEN concat('EXIF;GPS=',
                 doc_id % 180 - 90, ',', (doc_id * 7) % 360 - 180,
                 ';IMG;', text)
               WHEN doc_id % 4 = 3 THEN 'EXIF;CAM=fx9;IMG;' || text
               ELSE 'IMG;' || text END AS payload
        FROM documents),
      f AS (SELECT source,
          CASE WHEN payload LIKE 'EXIF;%' THEN 1 ELSE 0 END AS has_exif,
          CASE WHEN payload LIKE '%GPS=%' THEN 1 ELSE 0 END AS has_gps,
          CAST(strlen(payload) AS BIGINT) AS ob,
          CAST(strlen(regexp_replace(payload, 'GPS=[^;]*;', '', 'g'))
            AS BIGINT) AS sb
        FROM p)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(has_exif) AS BIGINT) AS n_exif,
        CAST(SUM(has_gps) AS BIGINT) AS n_gps,
        CAST(SUM(ob) AS BIGINT) AS orig_bytes,
        CAST(SUM(sb) AS BIGINT) AS scrubbed_bytes,
        CAST(SUM(ob - sb) AS BIGINT) AS removed_bytes
      FROM f GROUP BY source ORDER BY source""")),

    // ---- end-to-end crawl-to-corpus composite: the c38/c39 URL
    // stages, t38 extraction, t26 boilerplate scrub, t02 quality and
    // t01 langid chained in REAL pipeline order over one fixture, with
    // per-source stage-loss accounting. Every stage is oracle-gated in
    // isolation elsewhere; THIS query proves they compose (column
    // contracts, ordering, verdict arithmetic) — the oracle replays
    // the whole chain as one CTE stack ------------------------------
    ("c40_crawl_corpus", (s: SparkSession, d: String) =>
      graft.ext.Crawl.corpusDatasheet(t(s, d, "documents")),
      Some {
        val txt =
          "trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))"
        val allStop = TextAnalysis.stopwords.flatMap(_._2)
          .map(w => s"'$w'").mkString(", ")
        val langAgg = TextAnalysis.stopwords.map { case (l, _) =>
          s"""CAST(SUM(CASE WHEN kept AND predicted_lang = '$l'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_$l"""
        }.mkString(",\n             ")
        val langOut = TextAnalysis.stopwords
          .map { case (l, _) => s"CAST(COALESCE(r2.n_$l, 0) AS BIGINT) AS n_$l" }
          .mkString(",\n             ")
        s"""
      WITH $urlNormCtes,
      $robotsAdmissionCtes,
      kp AS (SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY norm_url) AS keep_doc FROM n5),
      base AS (SELECT d.doc_id, d.source, d.text,
                 kp.doc_id <> kp.keep_doc AS is_url_dup, adm.allowed
               FROM documents d JOIN kp USING (doc_id)
               JOIN adm USING (doc_id)),
      r1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_url_dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_url_dup,
               CAST(SUM(CASE WHEN NOT is_url_dup AND NOT allowed
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_robots_blocked
             FROM base GROUP BY source),
      h AS (SELECT doc_id, source,
        '<html><head><title>Doc ' || doc_id ||
        '</title><style>.nav{color:#fff}</style><script>var t="' || doc_id ||
        '";track(t);</script></head><body><div><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></div>' ||
        CASE WHEN doc_id % 5 = 2
             THEN '<div>ad <a href="/buy">buy now</a> <a href="/sub">subscribe today</a></div>'
             ELSE '' END ||
        '<p>' || text ||
        '</p><p>related reading material worth your time see <a href="/more">more like doc ' || doc_id ||
        '</a></p><!-- rendered in 3ms --><div><a href="/terms">terms</a> <a href="/privacy">privacy</a> (c) site</div></body></html>'
          AS html FROM base WHERE NOT is_url_dup AND allowed),
      m AS (SELECT doc_id, source,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
          '<script[^>]*>.*?</script>', ' ', 'g'),
          '<style[^>]*>.*?</style>', ' ', 'g'),
          '<!--.*?-->', ' ', 'g'),
          '</(p|div|title|li|h1|h2|h3)>', '@@BLK@@', 'g') AS t FROM h),
      k AS (SELECT doc_id, source,
        list_filter(
          list_filter(string_split(t, '@@BLK@@'), x -> length($txt) > 0),
          x -> len(string_split($txt, ' ')) >= 3
            AND coalesce(length(array_to_string(regexp_extract_all(x,
              '<a[^>]*>([^<]*)</a>', 1), '')), 0) * 100
              <= length($txt) * 30) AS kept
        FROM m),
      ex AS (SELECT doc_id, source, CAST(len(kept) AS INT) AS n_kept_blocks,
               array_to_string(list_transform(kept, x -> $txt), ' ')
                 AS extracted FROM k),
      pw AS (SELECT doc_id, string_split(extracted, ' ') AS ws FROM ex),
      ps AS (SELECT doc_id, CAST(unnest(range(len(ws) - 2)) AS INT) AS pos, ws
             FROM pw WHERE len(ws) >= 3),
      sh AS (SELECT doc_id, pos,
               concat_ws(' ', ws[pos+1], ws[pos+2], ws[pos+3]) AS s FROM ps),
      bl AS (SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS nd
                            FROM sh GROUP BY 1) z WHERE nd >= 20),
      cov AS (SELECT DISTINCT sh.doc_id, sh.pos + o.o AS cpos
              FROM sh JOIN bl USING (s) CROSS JOIN range(3) o(o)),
      tok AS (SELECT doc_id, CAST(unnest(range(len(ws))) AS INT) AS pos, ws
              FROM pw),
      tok2 AS (SELECT doc_id, pos, ws[pos+1] AS tok FROM tok),
      sc AS (SELECT t2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_scrub_kept,
               COALESCE(string_agg(t2.tok, ' ' ORDER BY t2.pos), '')
                 AS scrubbed_text
             FROM tok2 t2 LEFT JOIN cov
               ON cov.doc_id = t2.doc_id AND cov.cpos = t2.pos
             WHERE cov.doc_id IS NULL GROUP BY 1),
      sb AS (SELECT ex.doc_id, ex.source, ex.n_kept_blocks,
               CAST(len(pw.ws) AS BIGINT) AS n_tokens,
               CAST(COALESCE(sc.n_scrub_kept, 0) AS BIGINT) AS n_scrub_kept,
               COALESCE(sc.scrubbed_text, '') AS scrubbed_text
             FROM ex JOIN pw USING (doc_id) LEFT JOIN sc USING (doc_id)),
      qx AS (SELECT *, string_split(scrubbed_text, ' ') AS cw FROM sb),
      ql AS (SELECT *,
               CASE WHEN length(scrubbed_text) > 0 THEN
                 0.4 * (CAST(len(list_distinct(cw)) AS DOUBLE) / len(cw))
                 + 0.4 * (1.0 - CAST(len(list_filter(cw,
                     w -> w IN ($allStop))) AS DOUBLE) / len(cw))
                 + 0.2 * LEAST((CAST(length(scrubbed_text) - len(cw) + 1
                     AS DOUBLE) / len(cw)) / 10.0, 1.0)
               END AS quality,
               $langidChunkScoreCols FROM qx),
      pl AS (SELECT *, $langidCase AS predicted_lang,
               (n_kept_blocks >= 1 AND length(scrubbed_text) > 0
                 AND quality >= 0.65) AS kept FROM ql),
      r2 AS (SELECT source,
               CAST(SUM(n_tokens - n_scrub_kept) AS BIGINT) AS boiler_tokens,
               CAST(SUM(CASE WHEN n_kept_blocks = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_no_blocks,
               CAST(SUM(CASE WHEN n_kept_blocks >= 1
                 AND length(scrubbed_text) = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_scrub_empty,
               CAST(SUM(CASE WHEN n_kept_blocks >= 1
                 AND length(scrubbed_text) > 0 AND quality < 0.65
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(COALESCE(SUM(CASE WHEN kept THEN length(scrubbed_text)
                 END), 0) AS BIGINT) AS kept_chars,
               CAST(COALESCE(SUM(CASE WHEN kept THEN n_scrub_kept END), 0)
                 AS BIGINT) AS kept_words,
               CAST(COUNT(DISTINCT CASE WHEN kept THEN predicted_lang END)
                 AS BIGINT) AS n_langs_kept,
               $langAgg,
               MIN(CASE WHEN kept THEN quality END) AS min_quality,
               MAX(CASE WHEN kept THEN quality END) AS max_quality
             FROM pl GROUP BY source)
      SELECT r1.source, r1.n_docs, r1.n_url_dup, r1.n_robots_blocked,
             CAST(r1.n_docs - r1.n_url_dup - r1.n_robots_blocked AS BIGINT)
               AS n_fetched,
             CAST(COALESCE(r2.boiler_tokens, 0) AS BIGINT) AS boiler_tokens,
             CAST(COALESCE(r2.n_no_blocks, 0) AS BIGINT) AS n_no_blocks,
             CAST(COALESCE(r2.n_scrub_empty, 0) AS BIGINT) AS n_scrub_empty,
             CAST(COALESCE(r2.n_low_quality, 0) AS BIGINT) AS n_low_quality,
             CAST(COALESCE(r2.n_kept, 0) AS BIGINT) AS n_kept,
             CAST(COALESCE(r2.kept_chars, 0) AS BIGINT) AS kept_chars,
             CAST(COALESCE(r2.kept_words, 0) AS BIGINT) AS kept_words,
             CAST(COALESCE(r2.n_langs_kept, 0) AS BIGINT) AS n_langs_kept,
             $langOut,
             r2.min_quality, r2.max_quality
      FROM r1 LEFT JOIN r2 USING (source) ORDER BY source"""
      }),

    // ---- WordPiece vocabulary TRAINING: the likelihood-gain merge
    // objective freq(pair)/(freq(a)·freq(b)) over the t17 corpus
    // convention, compared EXACTLY as floor((pair << 30)/(fa·fb)) with
    // (score DESC, a, b) tie-break. The oracle unrolls the same 4
    // iterations: unit freqs recounted per iteration over the current
    // segmentation, pair argmax by the identical integer score -------
    ("t40_wordpiece_train", (s: SparkSession, d: String) =>
      TextAnalysis.wordpieceTrain(t(s, d, "documents"),
        vocabTop = 200, iters = 4),
      Some {
        s"""
      WITH $wordpieceTrainCtes
      SELECT * FROM (
        SELECT 1 AS iter, a AS sym_a, b AS sym_b,
               CAST(cnt AS BIGINT) AS pair_count, CAST(fa AS BIGINT) AS freq_a,
               CAST(fb AS BIGINT) AS freq_b, CAST(score_q AS BIGINT) AS score_q
        FROM tp1
        UNION ALL SELECT 2, a, b, CAST(cnt AS BIGINT), CAST(fa AS BIGINT),
               CAST(fb AS BIGINT), CAST(score_q AS BIGINT) FROM tp2
        UNION ALL SELECT 3, a, b, CAST(cnt AS BIGINT), CAST(fa AS BIGINT),
               CAST(fb AS BIGINT), CAST(score_q AS BIGINT) FROM tp3
        UNION ALL SELECT 4, a, b, CAST(cnt AS BIGINT), CAST(fa AS BIGINT),
               CAST(fb AS BIGINT), CAST(score_q AS BIGINT) FROM tp4) z
      ORDER BY iter"""
      }),

    // ---- train-then-APPLY composition: t39's greedy longest-match
    // walk consuming t40's TRAINED vocabulary (dictionary chars + the
    // 4 likelihood-merge products) instead of the literal top-K — the
    // deployed-tokenizer path end to end, over the t39 compound/OOV
    // plant. The oracle chains the full training CTE stack into the
    // unrolled 12-step walk ------------------------------------------
    ("t41_wordpiece_trained_apply", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      TextAnalysis.wordpieceApplyWith(
        TextAnalysis.wordpiecePlant(docs),
        TextAnalysis.wordpieceTrainedUnits(docs, vocabTop = 200, iters = 4))
    },
      Some(wordpieceTrainedApplySql)),

    // ---- t43: the SAME trained-vocab apply through the production
    // walk — first-char-bucketed map probe instead of the flat unit
    // array (O(bucket) per position, the 30k-vocab shape). Same oracle
    // STRING as t41: the two walks must be value-identical ------------
    ("t43_wordpiece_trie_apply", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      TextAnalysis.wordpieceApplyMapped(
        TextAnalysis.wordpiecePlant(docs),
        TextAnalysis.wordpieceTrainedUnits(docs, vocabTop = 200, iters = 4))
    },
      Some(wordpieceTrainedApplySql)),

    // ---- t45: the SAME trained-vocab apply through a codegen'd TRIE
    // Expression (LongestUnitMatch): per position ONE trie descent,
    // O(longest unit) independent of |vocab| — the deployed-tokenizer
    // shape at a 30k-unit vocabulary, one level past t43's first-char
    // buckets. Same oracle STRING as t41/t43: all three walks must be
    // value-identical --------------------------------------------------
    ("t45_wordpiece_codegen_trie", (s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      TextAnalysis.wordpieceApplyTrie(
        TextAnalysis.wordpiecePlant(docs),
        TextAnalysis.wordpieceTrainedUnits(docs, vocabTop = 200, iters = 4))
    },
      Some(wordpieceTrainedApplySql)),

    // ---- t42: unigram-LM vocabulary pruning (the SentencePiece prune
    // step in its integer-exact uniform-prior form): each round scores
    // every trained multi-char unit by the TOKEN INFLATION its removal
    // causes under single-best greedy segmentation of the training
    // dictionary, prunes the (loss ASC, unit ASC) argmin, re-segments.
    // The oracle unrolls both prune rounds over the shared t40
    // training stack --------------------------------------------------
    ("t42_unigram_prune", (s: SparkSession, d: String) =>
      TextAnalysis.unigramPrune(t(s, d, "documents"),
        vocabTop = 200, iters = 4, pruneIters = 2),
      Some(unigramPruneSql)),

    // ---- t44: unigram-LM Viterbi-EM training (Kudo ACL'18 §3.2,
    // SentencePiece's practical one-best mode, integer-exact): E-step =
    // exact per-word Viterbi DP under the lexicographic order (piece
    // count, −Σ score, piece string); M-step = scores from
    // freq-weighted use counts; 3 unrolled rounds over the t40-trained
    // unit set — round 1 is the fewest-pieces start, later rounds'
    // segmentations depend on the learned scores ----------------------
    ("t44_unigram_viterbi_em", (s: SparkSession, d: String) =>
      TextAnalysis.unigramViterbiEm(t(s, d, "documents"),
        vocabTop = 200, iters = 4, emRounds = 3),
      Some(unigramViterbiEmSql)),

    // ---- per-domain crawl-politeness budget audit: the events table
    // as the fetch log (event_id through the %7 URL plant -> c38
    // registered domains), gaps between consecutive same-domain
    // fetches vs the crawl-delay policy PARSED from the per-domain
    // robots plant (the c42 -> c41 wiring — the policy is derived
    // in-engine, not handed in), hourly burst profile, and the next
    // round's frontier budget = least(share cap, politeness cap).
    // All integer epoch-ms math --------------------------------------
    ("c41_crawl_politeness", (s: SparkSession, d: String) => {
      val ev = t(s, d, "events")
        .select(col("event_id").as("doc_id"), col("ts"))
      graft.ext.Curation.crawlPoliteness(
        graft.ext.Curation.urlNormalize(graft.ext.Curation.urlPlant(ev))
          .select(col("domain"), col("ts")),
        policy = graft.ext.Curation.robotsDelayPolicy(s),
        defaultDelayMs = 600000L, capSharePct = 20)
    },
      Some(s"""
      WITH ${urlNormCtesOver("(SELECT event_id AS doc_id FROM events) ev0")},
      $robotsRulesCtes,
      fx AS (SELECT n5.domain, epoch_ms(e.ts) AS ms
             FROM n5 JOIN events e ON e.event_id = n5.doc_id),
      dl AS (SELECT domain, ms,
               coalesce(rbp.effective_delay_s * 1000, 600000) AS delay_ms,
               ms - LAG(ms) OVER (PARTITION BY domain ORDER BY ms) AS gap
             FROM fx LEFT JOIN rbp USING (domain)),
      gr AS (SELECT domain, CAST(MAX(delay_ms) AS BIGINT) AS crawl_delay_ms,
               CAST(COUNT(*) AS BIGINT) AS n_fetches,
               CAST(SUM(CASE WHEN gap < delay_ms THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_violations,
               CAST(MIN(gap) AS BIGINT) AS min_gap_ms
             FROM dl GROUP BY domain),
      hb AS (SELECT domain, ms // 3600000 AS hr, COUNT(*) AS nh
             FROM fx GROUP BY 1, 2),
      br AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(MAX(nh) AS BIGINT) AS max_per_window
             FROM hb GROUP BY domain),
      tt AS (SELECT COUNT(*) AS total, MAX(ms) - MIN(ms) AS span_ms FROM fx)
      SELECT gr.domain, gr.n_fetches, br.n_windows, br.max_per_window,
             gr.crawl_delay_ms, gr.n_violations, gr.min_gap_ms,
             CAST((tt.total * 20) // 100 AS BIGINT) AS share_cap,
             CAST(tt.span_ms // gr.crawl_delay_ms + 1 AS BIGINT)
               AS politeness_cap,
             CAST(LEAST((tt.total * 20) // 100,
               tt.span_ms // gr.crawl_delay_ms + 1) AS BIGINT) AS budget,
             gr.n_violations = 0 AS compliant,
             gr.n_fetches > LEAST((tt.total * 20) // 100,
               tt.span_ms // gr.crawl_delay_ms + 1) AS over_budget
      FROM gr JOIN br USING (domain) CROSS JOIN tt ORDER BY gr.domain""")),

    // ---- m16: real EXIF/TIFF byte-walker — m15's audit schema over
    // REAL TIFF payloads (II/MM BOM, magic 42, IFD0 entry table, GPS
    // sub-IFD behind 0x8825, strip behind 0x0111), scrubbed
    // surgically with offset patching. The fixture layout is
    // closed-form over doc_id, so the oracle verifies every byte
    // total and the parse proofs (endianness counts, geometry sum)
    // analytically without decoding a TIFF ------------------------
    ("m16_tiff_privacy", (s: SparkSession, d: String) =>
      graft.ext.Multimodal.tiffPrivacyAudit(t(s, d, "documents")),
      Some("""
      WITH p AS (SELECT doc_id, source,
          4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h, doc_id % 4 AS cls,
          3 + CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END AS n
        FROM documents),
      f AS (SELECT source,
          CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS le,
          CASE WHEN cls IN (1, 3) THEN 1 ELSE 0 END AS exif,
          CASE WHEN cls = 1 THEN 1 ELSE 0 END AS gps,
          w * h AS wh,
          14 + 12 * n + w * h + CASE WHEN cls = 1 THEN 30 ELSE 0 END AS ob,
          CASE WHEN cls = 1 THEN 42 ELSE 0 END AS rm
        FROM p)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(le) AS BIGINT) AS n_le,
        CAST(SUM(exif) AS BIGINT) AS n_exif,
        CAST(SUM(gps) AS BIGINT) AS n_gps,
        CAST(SUM(wh) AS BIGINT) AS wh_sum,
        CAST(SUM(ob) AS BIGINT) AS orig_bytes,
        CAST(SUM(ob - rm) AS BIGINT) AS scrubbed_bytes,
        CAST(SUM(rm) AS BIGINT) AS removed_bytes
      FROM f GROUP BY source ORDER BY source""")),

    // ---- m17: EXIF-in-JPEG privacy scrub — m16's TIFF byte-walker
    // composed with a JPEG segment scanner (SOI, APP1 length covering
    // itself, "Exif\0\0" identifier per EXIF 2.3 §4.5.4, a COM segment
    // the scanner must skip): GPS scrubbed inside the APP1 with the
    // segment length patched. The fixture layout stays closed-form over
    // doc_id, so the oracle verifies every byte total analytically ----
    ("m17_jpeg_privacy", (s: SparkSession, d: String) =>
      graft.ext.Multimodal.jpegPrivacyAudit(t(s, d, "documents")),
      Some("""
      WITH p AS (SELECT doc_id, source,
          4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h, doc_id % 4 AS cls,
          3 + CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END AS n
        FROM documents),
      f AS (SELECT source,
          CASE WHEN cls IN (1, 3) THEN 1 ELSE 0 END AS exif,
          CASE WHEN cls IN (1, 3) AND doc_id % 3 <> 0 THEN 1 ELSE 0 END
            AS le,
          CASE WHEN cls = 1 THEN 1 ELSE 0 END AS gps,
          CASE WHEN cls IN (1, 3) THEN w * h ELSE 0 END AS wh,
          2 + CASE WHEN cls IN (1, 3)
                THEN 10 + 14 + 12 * n + w * h
                  + CASE WHEN cls = 1 THEN 30 ELSE 0 END
                ELSE 0 END + 9 + 2 AS ob,
          CASE WHEN cls = 1 THEN 42 ELSE 0 END AS rm
        FROM p)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(le) AS BIGINT) AS n_le,
        CAST(SUM(exif) AS BIGINT) AS n_exif,
        CAST(SUM(gps) AS BIGINT) AS n_gps,
        CAST(SUM(wh) AS BIGINT) AS wh_sum,
        CAST(SUM(ob) AS BIGINT) AS orig_bytes,
        CAST(SUM(ob - rm) AS BIGINT) AS scrubbed_bytes,
        CAST(SUM(rm) AS BIGINT) AS removed_bytes
      FROM f GROUP BY source ORDER BY source""")),

    // ---- c42: robots.txt policy extraction (RFC 9309) over the %5
    // plant — the in-engine derivation of c41's policy table: the
    // `*` group's crawl-delay (null when absent/malformed),
    // disallow/allow counts with the empty-Disallow allow-all rule,
    // the full-block verdict, file-scoped sitemap count; a named
    // agent's group must not leak into the `*` policy ---------------
    ("c42_robots_policy", (s: SparkSession, d: String) =>
      graft.ext.Curation.robotsPolicy(t(s, d, "documents")),
      Some("""
      WITH r AS (SELECT doc_id,
          CASE doc_id % 5
            WHEN 0 THEN concat_ws(chr(10), 'User-agent: *',
              'User-agent: otherbot', 'Crawl-delay: 10',
              'Disallow: /private', 'Disallow: /tmp')
            WHEN 1 THEN concat_ws(chr(10), 'User-agent: *', 'Disallow: /')
            WHEN 2 THEN concat_ws(chr(10), 'User-Agent: googlebot',
              'Disallow: /a', '', 'User-agent: *', 'Crawl-delay: 5',
              'Allow: /public', 'Disallow: /x',
              'Sitemap: https://example.com/s.xml')
            WHEN 3 THEN ''
            ELSE concat_ws(chr(10), 'User-agent: *', 'Crawl-delay: soon',
              'Disallow:')
          END AS txt FROM documents),
      p AS (SELECT doc_id, txt,
          list_transform(string_split(txt, chr(10)),
            l -> lower(trim(l))) AS ls FROM r),
      q AS (SELECT doc_id, txt, ls,
          list_filter(range(1, len(ls) + 1),
            i -> regexp_matches(ls[i], '^user-agent:[ ]*[*]$'))[1] AS star
          FROM p),
      gb AS (SELECT doc_id, txt, ls, star,
          coalesce(list_filter(range(1, len(ls) + 1),
            i -> i > star AND NOT regexp_matches(ls[i],
              '^user-agent:'))[1], len(ls) + 1) AS beg FROM q),
      g AS (SELECT doc_id, txt, ls, star, beg,
          list_filter(range(1, len(ls) + 1),
            i -> i >= beg AND regexp_matches(ls[i], '^user-agent:'))[1]
            AS nxt FROM gb),
      h AS (SELECT doc_id, txt, ls,
          CASE WHEN star IS NULL THEN []
               ELSE ls[beg : coalesce(nxt, len(ls) + 1) - 1]
          END AS grp FROM g)
      SELECT doc_id, length(txt) > 0 AS has_robots,
        CAST(regexp_extract(list_filter(grp,
            l -> regexp_matches(l, '^crawl-delay:[ ]*[0-9]+[ ]*$'))[1],
          ':[ ]*([0-9]+)', 1) AS INT) AS crawl_delay_s,
        CAST(len(list_filter(grp,
          l -> regexp_matches(l, '^disallow:[ ]*/'))) AS INT) AS n_disallow,
        len(list_filter(grp,
          l -> regexp_matches(l, '^disallow:[ ]*/[ ]*$'))) > 0
          AS disallow_all,
        CAST(len(list_filter(grp,
          l -> regexp_matches(l, '^allow:[ ]*/'))) AS INT) AS n_allow,
        CAST(len(list_filter(ls,
          l -> regexp_matches(l, '^sitemap:[ ]*[^ ]'))) AS INT) AS n_sitemaps
      FROM h ORDER BY doc_id""")),

    // ---- c43: robots-rule URL admission (RFC 9309 §2.2.2) — the
    // enforcement half c42 lacked: every frontier URL's path+query is
    // evaluated against its domain's `*`-group Allow/Disallow rules
    // with longest-match precedence, Allow winning equal-length ties;
    // no match = allowed. Exercised: Allow-overrides-shorter-Disallow,
    // case-sensitive paths, Disallow-/ full block behind a named group
    // that must not leak, the equal-length tie, empty-Disallow
    // allow-all, and percent-encoded octet matching ------------------
    ("c43_robots_admission", (s: SparkSession, d: String) =>
      graft.ext.Curation.robotsAdmission(t(s, d, "documents")),
      Some(s"""
      WITH $urlNormCtes,
      $robotsAdmissionCtes,
      bc AS (SELECT domain,
               CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
                 AS domain_blocked
             FROM adm GROUP BY domain)
      SELECT adm.doc_id, adm.norm_url, adm.domain, adm.target,
        adm.matched_rule, adm.matched_allow, adm.allowed, bc.domain_blocked
      FROM adm JOIN bc USING (domain) ORDER BY adm.doc_id""")),

    // ---- c44: sitemap URL discovery against the live frontier — the
    // crawl chain's DISCOVERY half: locs extracted from each domain's
    // planted sitemap XML, canonicalized by the SAME c38 rules the
    // frontier uses, robots-admitted (c43), and probed against the
    // already-crawled canonical set; fetchable = allowed AND unseen.
    // The corpus is only touched by a broadcast left-semi probe -------
    ("c44_sitemap_discovery", (s: SparkSession, d: String) =>
      graft.ext.Curation.sitemapFrontier(t(s, d, "documents")),
      Some(s"""
      WITH $urlNormCtes,
      $robotsRulesCtes,
      sm AS ($domainSitemapsValues),
      lc0 AS (SELECT sm_domain, unnest(regexp_extract_all(sitemap_xml,
                '<loc>([^<]*)</loc>', 1)) AS url FROM sm),
      lc AS (SELECT row_number() OVER (ORDER BY sm_domain, url) AS doc_id,
               sm_domain, url FROM lc0),
      ${urlNormChainOver("lc", "q")},
      ${robotsAdmissionCtesOver("q5", "s")},
      sn AS (SELECT DISTINCT norm_url FROM n5)
      SELECT lc.sm_domain, lc.url, a.norm_url, a.domain, a.target,
        a.matched_rule, a.allowed,
        (sn.norm_url IS NOT NULL) AS already_seen,
        (a.allowed AND sn.norm_url IS NULL) AS fetchable
      FROM sadm a JOIN lc USING (doc_id)
      LEFT JOIN sn ON sn.norm_url = a.norm_url
      ORDER BY a.norm_url, lc.url""")),

    // ---- c48: CROSS-DOMAIN sitemap discovery — the sitemaps.org
    // cross-submission rule c44 skips: a loc on a foreign registered
    // domain is trusted only when that domain's robots.txt advertises
    // the exact sitemap URL; trust gates fetchability separately from
    // admission (the planted example.co.uk foreign loc is admitted by
    // its own robots yet stays unfetchable — no advertisement) --------
    ("c48_sitemap_cross_domain", (s: SparkSession, d: String) =>
      graft.ext.Curation.sitemapCrossDiscovery(t(s, d, "documents")),
      Some(s"""
      WITH $sitemapCrossCtes
      SELECT sm_domain, url, sitemap_url, norm_url, domain, allowed,
        is_foreign, trusted, already_seen,
        (trusted AND allowed AND NOT already_seen) AS fetchable
      FROM xdisc ORDER BY norm_url, url, sm_domain""")),

    // ---- c50: the robots-ADVERTISED sitemap discovery ledger — the
    // real-world entry point: Sitemap: lines from the fetched robots
    // files resolve through the shared canon, match (or miss) actual
    // sitemap content at the canonical URL, and roll the per-loc c48
    // verdicts up per advertisement — what was advertised, by whom,
    // was it there, and what did it yield -----------------------------
    ("c50_sitemap_ledger", (s: SparkSession, d: String) =>
      graft.ext.Curation.sitemapLedger(t(s, d, "documents")),
      Some(s"""
      WITH $sitemapCrossCtes,
      agg AS (SELECT sitemap_url AS agg_url,
               CAST(COUNT(*) AS BIGINT) AS n_locs,
               CAST(SUM(CASE WHEN trusted AND allowed AND NOT already_seen
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_fetchable,
               CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_blocked,
               CAST(SUM(CASE WHEN already_seen THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_seen,
               CAST(SUM(CASE WHEN is_foreign AND NOT trusted
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_untrusted
             FROM xdisc GROUP BY sitemap_url),
      ad0 AS (SELECT domain AS advertiser_domain,
               unnest(list_transform(list_filter(
                 list_transform(string_split(robots_txt, chr(10)),
                   l -> trim(l)),
                 l -> regexp_matches(lower(l), '^sitemap:[ ]*[^ ]')),
                 l -> trim(substr(l, strpos(l, ':') + 1)))) AS url
             FROM rb),
      ad1 AS (SELECT row_number() OVER (ORDER BY advertiser_domain, url)
                 AS doc_id, advertiser_domain, url FROM ad0),
      ${urlNormChainOver("ad1", "z")},
      smc AS (SELECT 'https://' || sm_domain || '/sitemap.xml'
                 AS content_url FROM sm)
      SELECT ad1.advertiser_domain, ad1.url AS sitemap_url,
        z5.domain AS sm_domain,
        (z5.domain = ad1.advertiser_domain) AS self_advertised,
        (smc.content_url IS NOT NULL) AS found,
        coalesce(agg.n_locs, 0) AS n_locs,
        coalesce(agg.n_fetchable, 0) AS n_fetchable,
        coalesce(agg.n_blocked, 0) AS n_blocked,
        coalesce(agg.n_seen, 0) AS n_seen,
        coalesce(agg.n_untrusted, 0) AS n_untrusted
      FROM z5 JOIN ad1 USING (doc_id)
      LEFT JOIN smc ON smc.content_url = z5.norm_url
      LEFT JOIN agg ON agg.agg_url = z5.norm_url
      ORDER BY ad1.advertiser_domain, ad1.url""")),

    // ---- c51: sitemap-INDEX expansion — the protocol's second file
    // type (a site past the 50k-URL limit splits into children listed
    // by a <sitemapindex>): child URLs extracted with their lastmod,
    // canonicalized by the shared canon, matched against the content
    // convention, deduplicated per index at the canonical level (group
    // max lastmod drives freshness), refetch_due = found keeper with a
    // post-watermark modification — c47 at sitemap granularity --------
    ("c51_sitemap_index", (s: SparkSession, d: String) =>
      graft.ext.Curation.sitemapIndexExpand(s, lastCrawl = "2025-12-31"),
      Some(s"""
      WITH si AS ($domainSitemapIndexesValues),
      sb AS (SELECT index_domain, unnest(regexp_extract_all(index_xml,
               '<sitemap>(.*?)</sitemap>', 1)) AS b FROM si),
      se0 AS (SELECT index_domain,
               regexp_extract(b, '<loc>([^<]*)</loc>', 1) AS url,
               CAST(nullif(regexp_extract(b,
                 '<lastmod>([^<]*)</lastmod>', 1), '') AS DATE) AS lastmod
             FROM sb),
      se AS (SELECT row_number() OVER (ORDER BY index_domain, url)
               AS doc_id, * FROM se0),
      ${urlNormChainOver("se", "y")},
      sm AS ($domainSitemapsValues),
      smc AS (SELECT 'https://' || sm_domain || '/sitemap.xml'
                AS content_url FROM sm),
      j AS (SELECT se.index_domain, se.url, y5.norm_url, se.lastmod,
              (smc.content_url IS NOT NULL) AS found
            FROM y5 JOIN se USING (doc_id)
            LEFT JOIN smc ON smc.content_url = y5.norm_url),
      k AS (SELECT *,
              ROW_NUMBER() OVER (PARTITION BY index_domain, norm_url
                ORDER BY url) > 1 AS is_dup,
              MAX(lastmod) OVER (PARTITION BY index_domain, norm_url)
                AS grp_lastmod
            FROM j)
      SELECT index_domain, url AS child_url, norm_url AS norm_child,
        lastmod, is_dup, found,
        (found AND NOT is_dup AND grp_lastmod IS NOT NULL
          AND grp_lastmod > DATE '2025-12-31') AS refetch_due
      FROM k ORDER BY index_domain, norm_child, child_url""")),

    // ---- c47: lastmod-aware recrawl priority — the freshness half of
    // sitemap consumption: per <url> block the optional <lastmod> sits
    // next to the loc; an already-crawled canonical URL is due for
    // recrawl iff the advertised modification postdates the crawler's
    // watermark; unseen locs belong to c44's fetch set, and a seen loc
    // with no lastmod is conservatively NOT due ----------------------
    ("c47_recrawl_priority", (s: SparkSession, d: String) =>
      graft.ext.Curation.recrawlPriority(t(s, d, "documents"),
        lastCrawl = "2025-12-31"),
      Some(s"""
      WITH $urlNormCtes,
      sm AS ($domainSitemapsValues),
      ub AS (SELECT sm_domain, unnest(regexp_extract_all(sitemap_xml,
               '<url>(.*?)</url>', 1)) AS b FROM sm),
      lb AS (SELECT row_number() OVER (ORDER BY sm_domain, b) AS doc_id,
               sm_domain,
               regexp_extract(b, '<loc>([^<]*)</loc>', 1) AS url,
               CAST(nullif(regexp_extract(b,
                 '<lastmod>([^<]*)</lastmod>', 1), '') AS DATE) AS lastmod
             FROM ub),
      ${urlNormChainOver("lb", "q")},
      sn AS (SELECT DISTINCT norm_url FROM n5)
      SELECT lb.sm_domain, lb.url, q5.norm_url, lb.lastmod,
        (sn.norm_url IS NOT NULL) AS already_seen,
        (sn.norm_url IS NOT NULL AND lb.lastmod IS NOT NULL
          AND lb.lastmod > DATE '2025-12-31') AS recrawl_due
      FROM q5 JOIN lb USING (doc_id)
      LEFT JOIN sn ON sn.norm_url = q5.norm_url
      ORDER BY q5.norm_url, lb.url""")),

    // ---- c45: politeness-aware fetch schedule over the admitted
    // frontier: canonical URLs take per-domain slots in deterministic
    // norm_url order, slot k fetches at k·delay ms (robots-derived
    // crawl-delay or the default), slots past the horizon's politeness
    // capacity are DEFERRED — exact integer math throughout -----------
    ("c45_fetch_schedule", (s: SparkSession, d: String) =>
      graft.ext.Curation.fetchSchedule(t(s, d, "documents"),
        horizonMs = 3600000L, defaultDelayMs = 600000L),
      Some(s"""
      WITH $urlNormCtes,
      $robotsAdmissionCtes,
      kp AS (SELECT norm_url, domain, MIN(doc_id) AS keep_doc,
               MAX(allowed) AS allowed
             FROM adm GROUP BY norm_url, domain),
      dl AS (SELECT kp.*, coalesce(rbp.effective_delay_s * 1000, 600000)
               AS delay_ms,
               LEAST(3600000, coalesce(
                 (rbp.visit_to_min - rbp.visit_from_min) * 60000,
                 3600000)) AS cap_ms
             FROM kp LEFT JOIN rbp USING (domain) WHERE kp.allowed),
      rn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
               ORDER BY norm_url) - 1 AS slot FROM dl)
      SELECT domain, norm_url, keep_doc, CAST(slot AS INT) AS slot,
        CAST(delay_ms AS BIGINT) AS delay_ms,
        CAST(slot * delay_ms AS BIGINT) AS sched_ms,
        slot >= cap_ms // delay_ms + 1 AS deferred
      FROM rn ORDER BY domain, slot""")),

    // ---- c49: robots Request-rate/Visit-time extensions — the
    // de-facto lines wild robots files carry beyond RFC 9309:
    // Request-rate n/m implies a ceil(m/n)-second per-request delay
    // that composes with Crawl-delay via max (the stricter wins —
    // example.com's 2/10 must NOT weaken its Crawl-delay 10), and
    // Visit-time HHMM-HHMM is the daily window whose length caps
    // c45's schedulable horizon ---------------------------------------
    ("c49_robots_rate_extensions", (s: SparkSession, d: String) =>
      graft.ext.Curation.robotsRateExtensions(s),
      Some(s"""
      WITH $robotsRulesCtes
      SELECT domain, crawl_delay_s, rate_num, rate_den_s, rate_delay_s,
        visit_from_min, visit_to_min, effective_delay_s
      FROM rbp ORDER BY domain""")),

    // ---- c46: per-AGENT robots admission (RFC 9309 §2.2.1 group
    // matching): the same frontier evaluated as the generic crawler
    // AND as googlebot, which example.org's robots addresses by name —
    // the * view is a full block there while the named group allows
    // /a, so ignoring group selection gets one of the two verdict sets
    // wrong. Two rules chains + two admission passes in one oracle ----
    ("c46_robots_agent_admission", (s: SparkSession, d: String) =>
      graft.ext.Curation.robotsAgentAdmission(t(s, d, "documents")),
      Some(s"""
      WITH $urlNormCtes,
      rb AS ($domainRobotsValues),
      ${robotsRulesChainFor("", None)},
      ${robotsRulesChainFor("g", Some("googlebot"))},
      ${robotsAdmissionCtesOver("n5", "", "rbp")},
      ${robotsAdmissionCtesOver("n5", "g", "grbp")}
      SELECT * FROM (
        SELECT '*' AS agent, doc_id, norm_url, domain, target,
          matched_rule, allowed FROM adm
        UNION ALL
        SELECT 'googlebot', doc_id, norm_url, domain, target,
          matched_rule, allowed FROM gadm) z
      ORDER BY agent, doc_id"""))
  )

  def queries: Map[String, QFn] = defs.map(q => q._1 -> q._2).toMap
  def oracles: Map[String, String] =
    defs.collect { case (n, _, Some(o)) => n -> o.stripMargin.trim }.toMap
}
