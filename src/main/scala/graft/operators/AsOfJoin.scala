package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with the same key and right.ts <= left.ts.
  *
  * Spark has no native ASOF JOIN (DuckDB/kdb do). The naive encodings —
  * a correlated max-subquery per left row, or a non-equi range join —
  * rebuild the right side per row or explode into a theta join. This
  * operator instead uses the union + running-last-value formulation:
  * tag both sides, union them, and carry the latest right payload
  * forward with one window pass per key. Cost: ONE shuffle on the key,
  * linear scan within partitions — the formulation that holds at
  * 100 TB (and the standard way to express as-of semantics with
  * built-in operators; SURVEY §2.6 preference order (a)).
  *
  * Ties: a right row at exactly left.ts counts (at-or-before); callers
  * should pre-dedupe the right side to one row per (key, ts) for fully
  * deterministic payloads.
  */
object AsOfJoin {

  /** @param left       left rows; all its columns are preserved
    * @param right      right rows: key, ts, and payload columns
    * @param key        equi-join key column name (present both sides)
    * @param ts         event-time column name (present both sides)
    * @param payload    right-side payload column names to attach
    * @param asOfPrefix prefix for the attached columns (asof_ts, asof_<payload>)
    */
  def lastBefore(left: DataFrame, right: DataFrame, key: String, ts: String,
                 payload: Seq[String], asOfPrefix: String = "asof_"): DataFrame =
    asOf(left, right, key, ts, payload, asOfPrefix, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row with the
    * same key and right.ts >= left.ts (at-or-after; e.g. click -> next
    * conversion). Same tagged-union single-window plan as
    * [[lastBefore]], scanning in descending event time: the running
    * `last` then carries the nearest-later right payload. Tolerance
    * (max allowed gap) is a post-filter the caller applies — the
    * operator itself is unconditional, so one pass serves any
    * tolerance.
    */
  def firstAfter(left: DataFrame, right: DataFrame, key: String, ts: String,
                 payload: Seq[String], asOfPrefix: String = "asof_"): DataFrame =
    asOf(left, right, key, ts, payload, asOfPrefix, forward = true)

  /** Nearest as-of: the right row minimizing |right.ts - left.ts| with
    * the same key, ties resolved BACKWARD (the at-or-before row wins —
    * sensor-alignment semantics: prefer the reading that existed at
    * event time). Composed from one backward and one forward pass
    * (SURVEY §2.6 preference (a): both passes are the single-window
    * tagged-union plan on the same key, so AQE reuses the exchange).
    */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
              payload: Seq[String], asOfPrefix: String = "asof_"): DataFrame = {
    val back = asOf(left, right, key, ts, payload, "__b_", forward = false)
    val both = asOf(back, right, key, ts, payload, "__f_", forward = true)
    val bTs = col(s"__b_$ts"); val fTs = col(s"__f_$ts")
    val takeBack = fTs.isNull ||
      (bTs.isNotNull &&
        unix_micros(col(ts)) - unix_micros(bTs) <=
          unix_micros(fTs) - unix_micros(col(ts)))
    val out = left.columns.map(col) ++
      ((ts +: payload).map { p =>
        when(takeBack, col(s"__b_$p")).otherwise(col(s"__f_$p"))
          .as(s"$asOfPrefix$p")
      })
    both.select(out: _*)
  }

  private def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
                   payload: Seq[String], asOfPrefix: String,
                   forward: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // The tagged-union plan owns these names; a payload column literally
    // named "__t" would duplicate the struct field and make
    // col("__asof.__t") ambiguous (likewise the top-level tags).
    val reserved = Set("__t", "__ts", "__side", "__asof")
    val clashes = (payload ++ leftCols).filter(reserved.contains).distinct
    require(clashes.isEmpty,
      s"AsOfJoin reserves column names ${reserved.mkString(", ")}; " +
        s"rename: ${clashes.mkString(", ")}")
    // The whole right payload travels as ONE struct with ONE
    // last(ignoreNulls=true): per-column carries would back-fill a null
    // field of the genuinely-latest right row from an OLDER right row,
    // silently mixing fields of different right rows. The struct itself
    // is null exactly on left-tagged rows, so ignoreNulls skips those
    // and nothing else.
    val asofType = StructType(
      StructField("__t", right.schema(ts).dataType) +:
        payload.map(p => StructField(p, right.schema(p).dataType)))
    // side 0 sorts before side 1 at equal ts => right rows at exactly
    // left.ts are visible to that left row
    val taggedRight = right.select(
      (col(key) +: col(ts).as("__ts") +: lit(0).as("__side") +:
        struct((col(ts).as("__t") +: payload.map(col)): _*).as("__asof") +:
        leftCols.filterNot(c => c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(key) +: col(ts).as("__ts") +: lit(1).as("__side") +:
        lit(null).cast(asofType).as("__asof") +:
        leftCols.filterNot(c => c == key).map(col)): _*)

    // Backward: ascending scan, the running last right row is the most
    // recent at-or-before. Forward: DESCENDING ts — the running last
    // right row is then the nearest at-or-after. Either way, side 0
    // sorts before side 1 at equal ts, so a right row at exactly
    // left.ts is visible to that left row.
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__ts").desc else col("__ts").asc,
        col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+
        col("__asof.__t").as(s"${asOfPrefix}$ts")) ++
        payload.map(p => col(s"__asof.$p").as(s"${asOfPrefix}$p")): _*)
  }
}
