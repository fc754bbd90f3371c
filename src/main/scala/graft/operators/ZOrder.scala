package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving and the file-skipping audit that
  * justifies it — the multi-dimensional clustering layout behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. A table range-partitioned on
  * the interleaved key keeps BOTH dimensions locally dense inside each
  * file, so per-file min/max statistics prune a 2-D box predicate to a
  * handful of files, where a linear (single-column) sort prunes only
  * its leading dimension and scans a full stripe.
  *
  * The interleave is generated once as a bit plan and rendered per
  * engine (Spark spells shifts as `shiftleft`/`shiftright` functions,
  * the oracle engine as `<<`/`>>` operators), so both engines compute
  * the identical integer z value — pure integer arithmetic, exact
  * cross-engine by construction.
  */
object ZOrder {

  /** Spark SQL for interleaving the low `bits` bits of two
    * non-negative integer expressions (x gets the even output bits, y
    * the odd). */
  def interleaveSparkSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"shiftleft(shiftright($x, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
    }.mkString(" + ")

  /** The same bit plan in `<<`/`>>` operator syntax (DuckDB). */
  def interleaveDuckSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Data-skipping audit: given rows with integer dims `x`, `y` in
    * [0, 2^bits), simulate two physical layouts of 2^fileBits files —
    * `zorder` (files = leading bits of the interleaved key) and
    * `linear` (files = leading bits of x alone) — and report, per
    * layout, how a box predicate `x in [x0,x1] AND y in [y0,y1]` fares
    * against per-file min/max pruning: files touched, rows those files
    * hold (the scan cost after pruning), and the true match count.
    *
    * Everything is two partial-aggregable groupBys (per-file stats,
    * then per-layout rollup) over an exploded-by-layout projection —
    * no joins, no windows; at scale this is exactly the metadata pass
    * a lakehouse table format runs over its file-statistics manifest,
    * here derived from the data so the audit is self-contained.
    */
  def skippingAudit(rows: DataFrame, bits: Int, fileBits: Int,
                    x0: Int, x1: Int, y0: Int, y1: Int): DataFrame = {
    require(bits > 0 && fileBits > 0 && fileBits <= bits,
      "need 0 < fileBits <= bits")
    val z = expr(interleaveSparkSql("x", "y", bits))
    val base = rows.select(col("x").cast("long").as("x"),
        col("y").cast("long").as("y"))
      .withColumn("fz", shiftright(z, 2 * bits - fileBits))
      .withColumn("fx", shiftright(col("x"), bits - fileBits))
    val tagged = base.select(lit("zorder").as("layout"),
        col("fz").as("fid"), col("x"), col("y"))
      .unionAll(base.select(lit("linear").as("layout"),
        col("fx").as("fid"), col("x"), col("y")))
    val inBox = col("x").between(x0, x1) && col("y").between(y0, y1)
    val perFile = tagged.groupBy(col("layout"), col("fid"))
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"),
        count(lit(1)).as("n"),
        sum(when(inBox, 1L).otherwise(0L)).as("n_match"))
    val touched = col("min_x") <= x1 && col("max_x") >= x0 &&
      col("min_y") <= y1 && col("max_y") >= y0
    perFile.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(touched, 1L).otherwise(0L)).as("files_touched"),
        sum(when(touched, col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matched"))
      .orderBy(col("layout"))
  }

  /** Write `rows` (integer dims `x`, `y` in [0, 2^bits)) under `dir`
    * in two PHYSICAL parquet layouts of `nFiles` files each: `z/`
    * range-partitioned and sorted on the interleaved Morton key and
    * `lin/` on `x` alone. Small files -> one parquet row group per
    * file, so the reader's row-group min/max pruning IS file skipping.
    */
  def writeLayouts(rows: DataFrame, dir: String, bits: Int,
                   nFiles: Int): Unit = {
    val base = rows.select(col("x").cast("long").as("x"),
      col("y").cast("long").as("y"))
    base.withColumn("z", expr(interleaveSparkSql("x", "y", bits)))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .select(col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$dir/z")
    base.repartitionByRange(nFiles, col("x"))
      .sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$dir/lin")
  }

  /** All FileSourceScans of an executed plan, descending through AQE
    * wrappers and materialized query stages (plain `collect` stops at
    * both boundaries).
    */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf)
  }

  /** Execute a box-filtered aggregate over one layout dir and report
    * (rows the parquet scan EMITTED after row-group pruning, matched
    * row count, sum of matched x, sum of matched y).
    */
  def boxScan(spark: org.apache.spark.sql.SparkSession, path: String,
              x0: Int, x1: Int, y0: Int, y1: Int): (Long, Long, Long, Long) = {
    val agg = spark.read.parquet(path)
      .filter(col("x").between(x0, x1) && col("y").between(y0, y1))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("x")), lit(0L)).as("sx"),
        coalesce(sum(col("y")), lit(0L)).as("sy"))
    val row = agg.collect()(0)
    val scanned = scansOf(agg.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    (scanned, row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** End-to-end PHYSICAL data-skipping audit — the proof behind
    * [[skippingAudit]]'s simulation: write both layouts as real
    * parquet, run the same box predicate through Spark's scan, and
    * read the pruning off the scan's own numOutputRows metric (rows
    * surviving parquet row-group min/max skipping). Output carries the
    * matched-data checksums (oracle-reproducible from the source rows)
    * plus engine-computed pruning verdicts the oracle asserts TRUE —
    * the codec-dependent-value pattern: raw scanned-row counts depend
    * on range-partitioner sampling, so they are banded, not emitted.
    */
  def prunedScanAudit(rows: DataFrame, dir: String, bits: Int, nFiles: Int,
                      x0: Int, x1: Int, y0: Int, y1: Int): DataFrame = {
    val spark = rows.sparkSession
    writeLayouts(rows, dir, bits, nFiles)
    val (zScan, zN, zSx, zSy) = boxScan(spark, s"$dir/z", x0, x1, y0, y1)
    val (lScan, lN, lSx, lSy) = boxScan(spark, s"$dir/lin", x0, x1, y0, y1)
    val total = spark.read.parquet(s"$dir/z").count()
    import spark.implicits._
    Seq((zN, zSx, zSy,
      zN == lN && zSx == lSx && zSy == lSy, // layouts agree on the data
      zScan >= zN && lScan >= lN,           // a scan emits >= its matches
      zScan < total,                        // z: row groups were skipped
      lScan < total,                        // linear: x-stripe skipped too
      zScan < lScan))                       // z strictly beats linear
      .toDF("n_match", "sum_x", "sum_y", "layouts_agree", "scan_sound",
        "z_pruned", "lin_pruned", "z_beats_linear")
  }
}
