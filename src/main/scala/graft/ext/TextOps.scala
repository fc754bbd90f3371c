package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators.
  * All are pure column expressions (whole-stage-codegen friendly, no
  * UDFs) with DuckDB SQL twins for oracle verification.
  */
object TextOps {

  def words(c: Column): Column = split(c, " ")
  def wordsSql(e: String): String = s"string_split($e, ' ')"

  /** Distinct word n-gram shingles; empty array when the doc is shorter
    * than n words (mirrors DuckDB range() returning [] for negatives).
    */
  def wordShingles(c: Column, n: Int): Column = {
    val ws = words(c)
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k + 1))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  def wordShinglesSql(e: String, n: Int): String = {
    val parts = (0 until n)
      .map(k => s"${wordsSql(e)}[i + ${k + 1}]")
      .mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(len(${wordsSql(e)}) - ${n - 1}), i -> $parts))"
  }

  /** ALL word n-gram occurrences in order (NOT distinct — the
    * positional/multiset twin of [[wordShingles]] for coverage, span
    * and repetition operators); empty when shorter than n words. The
    * shingle at array index i (0-based) starts at word position i.
    */
  def allWordShingles(c: Column, n: Int): Column = {
    val ws = words(c)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k + 1))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB twin of [[allWordShingles]] (same order, same positions). */
  def allWordShinglesSql(e: String, n: Int): String = {
    val parts = (0 until n)
      .map(k => s"${wordsSql(e)}[i + ${k + 1}]")
      .mkString(" || ' ' || ")
    s"list_transform(range(len(${wordsSql(e)}) - ${n - 1}), i -> $parts)"
  }

  /** Distinct character n-grams; empty when shorter than n chars. */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def charNgramsSql(e: String, n: Int): String =
    s"list_distinct(list_transform(range(1, length($e) - ${n - 2}), i -> substr($e, i, $n)))"
}
