package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: the selection/layout steps between
  * dedup/quality scoring and an actual training corpus.
  *
  * Both operators are deterministic by construction (hash order / key
  * order, never rand()), so runs are reproducible and the DuckDB oracle
  * can verify them value-for-value — the property a curation pipeline
  * needs for auditable dataset releases.
  */
object Curation {

  /** Deterministic stratified sample: the `perStratum` docs per stratum
    * that rank first in (md5(text), doc_id) order — a uniform-ish,
    * seedless shuffle that every engine reproduces bit-for-bit.
    * One hash-partitioned window per stratum; no global sort, no
    * collect. At 100 TB the per-stratum windows parallelize over the
    * stratum key (salt a dominant stratum if needed).
    */
  def stratifiedSample(docs: DataFrame, stratum: String,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(md5(col("text")), col("doc_id"))
    graft.core.Tables.spread(docs)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perStratum)
      .select(col("doc_id"), col(stratum), col("rk"))
      .orderBy(col(stratum), col("rk"))
  }

  /** Contiguous greedy packing: docs are laid out per stratum in
    * doc_id order and cut into fixed-capacity bins by the running
    * length BEFORE each doc — the deterministic sequence-packing
    * shape used to batch variable-length documents for training
    * (capacity = context window in the length unit, here chars).
    * All-integer arithmetic: bin_id = floor(running/capacity) with a
    * rows-frame running sum, exact in both engines. Per-stratum windows
    * keep it parallel; a global layout would instead range-partition on
    * (stratum, doc_id) like operators.SeqNumber.
    */
  def packDocs(docs: DataFrame, stratum: String, lengthCol: String,
               capacity: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    graft.core.Tables.spread(docs)
      .withColumn("offset_in_stratum",
        coalesce(sum(col(lengthCol)).over(w), lit(0L)).cast("long"))
      // integer div, not `/`: Spark's / is double division and double
      // truncation vs DuckDB rounding diverges at the margins
      .withColumn("bin_id", expr(s"offset_in_stratum div $capacity"))
      .select(col("doc_id"), col(stratum), col(lengthCol),
        col("offset_in_stratum"), col("bin_id"))
      .orderBy(col(stratum), col("doc_id"))
  }
}
