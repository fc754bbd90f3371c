package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SORTED DISTINCT portable shingle hashes of a text column:
  * every distinct word n-gram's h32 (first 8 md5 hex chars, as in
  * [[Hashing.h32]]), ascending, as one `array<long>` per document —
  * the per-doc inverted-index row [[graft.ext.Dedup.containmentDupAsym]]
  * builds probes and postings from. One tight JVM loop per document:
  * the HOF spelling (transform + md5 per element) interprets a Catalyst
  * expression tree per shingle, which measures ~3x the whole query's
  * remaining cost at sf0.1. Returns null when the doc has fewer words
  * than the shingle size (such docs have no shingles, mirroring the
  * explode-based form where they simply have no rows).
  */
case class ShingleHashesOf(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes_of"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return null
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val hashes = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val d = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
        md.reset()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        hashes.add(h)
        ()
      }
      i += 1
    }
    val out = new Array[Long](hashes.size)
    val it = hashes.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesOf {
  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new ShingleHashesOf(ColumnGlue.expression(c), n))
}
