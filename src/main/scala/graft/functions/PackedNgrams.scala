package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams packed into sorted longs, windowed by
  * CODE POINT — the unit Spark's `substr`/`length` and DuckDB count —
  * so the windows are exactly [[graft.ext.TextOps.charNgrams]]'s (the
  * old code-unit loop split surrogate pairs across n-grams, silently
  * diverging from the oracle on non-BMP text).
  *
  * Packing width: 21 bits per code point for n <= 3 (63 bits — any
  * Unicode scalar fits, total function), 16 bits for n == 4 (BMP only;
  * a document containing an astral code point returns NULL and the
  * caller falls back to the string form for that document — see
  * [[graft.ext.Dedup.ngramJaccardDup]]). Either packing is injective on
  * its domain, so distinct counts, intersection counts, and therefore
  * Jaccard values are EXACTLY those of the string form — while the
  * per-pair merge scan compares longs instead of UTF8 byte strings and
  * the per-doc build allocates one long array instead of ~n_chars
  * substrings. One virtual call per document (CodegenFallback) around a
  * tight primitive loop; the per-pair hot path stays codegen'd in
  * [[SortedLongIntersectCount]].
  */
case class PackedCharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 4, "packed longs: n must be 1..4")

  private val bits = PackedCharNgrams.bitsPerChar(n)
  private val bmpOnly = bits == 16

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null marks a doc the packing can't carry
  override def prettyName: String = "packed_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // one pass: collect code points, bail to NULL on astral when BMP-only
    val cps = new Array[Int](s.length) // upper bound; cpCount <= char count
    var i = 0
    var cpCount = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (bmpOnly && cp > 0xffff) return null
      cps(cpCount) = cp
      cpCount += 1
      i += Character.charCount(cp)
    }
    val m = cpCount - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val arr = new Array[Long](m)
    i = 0
    while (i < m) {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << bits) | cps(i + k).toLong; k += 1 }
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
  /** 21-bit fields hold any Unicode scalar (3x21 = 63 bits); n = 4 only
    * fits BMP at 16 bits each. */
  def bitsPerChar(n: Int): Int = if (n <= 3) 21 else 16

  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new PackedCharNgrams(ColumnGlue.expression(c), n))
}

/** Inverse of [[PackedCharNgrams]]: packed longs back to the n-gram
  * strings. Used on the rare mixed pair (one packed doc, one astral
  * fallback doc) so the packed side can join the string-form intersect
  * without recomputing n-grams from the text. Order-preserving: packed
  * long order == code-point-lexicographic order == UTF8 byte order, so
  * a sorted input array stays sorted after unpacking.
  */
case class UnpackCharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val bits = PackedCharNgrams.bitsPerChar(n)
  private val mask = (1L << bits) - 1

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "unpack_char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      val sb = new java.lang.StringBuilder(2 * n)
      var k = n - 1
      while (k >= 0) {
        sb.appendCodePoint(((v >> (bits * k)) & mask).toInt)
        k -= 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnpackCharNgrams {
  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new UnpackCharNgrams(ColumnGlue.expression(c), n))
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
