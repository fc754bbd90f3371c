package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams packed into sorted longs (16 bits per
  * char, so n <= 4). Injective for BMP text, so the packed values are
  * in bijection with the n-gram strings: distinct counts, intersection
  * counts, and therefore Jaccard values are EXACTLY those of the
  * string form — while the per-pair merge scan compares longs instead
  * of UTF8 byte strings and the per-doc build allocates one long array
  * instead of ~n_chars substrings. One virtual call per document
  * (CodegenFallback) around a tight primitive loop; the per-pair hot
  * path stays codegen'd in [[SortedLongIntersectCount]].
  */
case class PackedCharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 4, "16 bits per char: n must be 1..4")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = s.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 16) | s.charAt(i + k).toLong; k += 1 }
      arr(i) = v
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0; var r = 0
    while (r < m) {
      if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackedCharNgrams {
  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new PackedCharNgrams(ColumnGlue.expression(c), n))
}

/** [[SortedIntersectCount]] for sorted long arrays (packed n-grams). */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = java.lang.Long.compare(x.getLong(i), y.getLong(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = java.lang.Long.compare($a.getLong($i), $b.getLong($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnGlue.column(new SortedLongIntersectCount(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))
}
