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

/** One-pass MinHash signature of a text column: the 16 permutation
  * minima over the doc's distinct word n-gram shingles, as one
  * `array<long>` per document.
  *
  * Exactly the values of [[graft.ext.Dedup.minhashSignatures]]
  * (shingles = space-joined word windows, distinct; h32 = first 8 md5
  * hex chars; perm j = (a_j*h + b_j) mod P with [[Hashing.perms]] and
  * P = 2^31-1 — all exact integer math, products < 2^63) — asserted in
  * the spec and by the d05/d09/d10 oracles — without the corpus-wide
  * shingle explode, the 16-min aggregate, or their shuffle. Returns
  * null when the doc has fewer words than the shingle size, mirroring
  * the explode-based form where such docs simply have no rows.
  */
case class MinhashSigOf(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_of"

  private val perms = Hashing.perms.toArray
  private val P = Hashing.MersennePrime

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return null
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(perms.length)(Long.MaxValue)
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
        var j = 0
        while (j < perms.length) {
          val v = (perms(j)._1 * h + perms(j)._2) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigOf {
  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new MinhashSigOf(ColumnGlue.expression(c), n))
}
