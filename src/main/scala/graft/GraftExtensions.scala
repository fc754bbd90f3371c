package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProductD, MinhashSigOf, PackedCharNgrams,
  SimhashOf, SortedIntersectCount, SortedLongIntersectCount}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions for sessions built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * or via spark.sql.extensions=graft.GraftExtensions — so pure-SQL
  * users (spark-sql shell, JDBC gateways) get dot_product_d and
  * sorted_intersect_count without touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_d"),
      info("dot_product_d", "dot_product_d(a, b) - double dot product of float arrays"),
      (exprs: Seq[Expression]) => DotProductD(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - common-element count of sorted arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_long_intersect_count"),
      info("sorted_long_intersect_count",
        "sorted_long_intersect_count(a, b) - common-element count of sorted bigint arrays"),
      (exprs: Seq[Expression]) => SortedLongIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash_of"),
      info("simhash_of", "simhash_of(text) - one-pass 64-bit simhash"),
      (exprs: Seq[Expression]) => SimhashOf(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig_of"),
      info("minhash_sig_of",
        "minhash_sig_of(text, n) - 16 minhash permutation minima over word n-gram shingles"),
      (exprs: Seq[Expression]) => MinhashSigOf(exprs(0), intArg(exprs(1), "minhash_sig_of"))))
    ext.injectFunction((
      FunctionIdentifier("packed_char_ngrams"),
      info("packed_char_ngrams",
        "packed_char_ngrams(text, n) - sorted distinct char n-grams packed into bigints (n <= 4)"),
      (exprs: Seq[Expression]) => PackedCharNgrams(exprs(0), intArg(exprs(1), "packed_char_ngrams"))))
    ext.injectFunction((
      FunctionIdentifier("char_windows"),
      info("char_windows",
        "char_windows(text, n) - all rolling n-code-point windows"),
      (exprs: Seq[Expression]) =>
        graft.functions.CharWindows(exprs(0), intArg(exprs(1), "char_windows"))))
    ext.injectFunction((
      FunctionIdentifier("quality_counts_of"),
      info("quality_counts_of",
        "quality_counts_of(text) - struct(n_words, n_distinct, n_stop, len) in one pass"),
      (exprs: Seq[Expression]) => graft.functions.QualityCountsOf(exprs(0),
        graft.ext.TextAnalysis.stopwords.flatMap(_._2))))
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: n must be an integer literal, got $other")
  }
}
