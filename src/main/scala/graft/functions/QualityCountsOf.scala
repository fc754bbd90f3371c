package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** One-pass word/distinct/stopword/length counts of a text column —
  * the inputs of [[graft.ext.TextAnalysis.qualityScore]], which
  * otherwise cost three interpreted higher-order-function passes
  * (size(filter(...)), size(array_distinct(...))) per document plus
  * the materialized word arrays. Tokenization is `split(" ", -1)`
  * exactly (empty tokens kept) and the length is code points, matching
  * the composed form column for column (asserted in the spec).
  * Returns struct(n_words, n_distinct, n_stop, len).
  */
case class QualityCountsOf(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false)))
  override def prettyName: String = "quality_counts_of"

  @transient private lazy val stopSet = stopwords.toSet

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val words = s.split(" ", -1)
    val seen = new java.util.HashSet[String](words.length * 2)
    var stop = 0
    var i = 0
    while (i < words.length) {
      seen.add(words(i))
      if (stopSet.contains(words(i))) stop += 1
      i += 1
    }
    InternalRow(words.length, seen.size, stop, s.codePointCount(0, s.length))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityCountsOf {
  def apply(c: Column, stopwords: Seq[String]): Column =
    ColumnGlue.column(new QualityCountsOf(ColumnGlue.expression(c), stopwords))
}
