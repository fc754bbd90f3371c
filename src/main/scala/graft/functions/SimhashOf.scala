package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash of a text column (Manku et al.'s web-scale
  * near-dup shape: 64 fingerprint bits, banded 4x16 downstream).
  *
  * Semantically identical to the composed column form in
  * [[graft.ext.Dedup.simhashViaAgg]] (split on single space keeping
  * empties; per-word hash bits 0-31 from h32 = md5 hex chars 1-8 and
  * bits 32-63 from h32b = md5 hex chars 9-16; fingerprint bit j set
  * when the +-1 tally of word-hash bits is positive) — asserted
  * column-for-column in the spec and by the d03/d04 oracles — but
  * computed per document in one tight loop: no 10M-row explode, no
  * 64-column aggregate, no shuffle. The md5 work per word is unchanged;
  * what disappears is the exchange and per-row aggregation machinery
  * around it. One virtual call per document (CodegenFallback) is noise
  * at that granularity. Bit 63 makes the long negative — band
  * extraction masks after the shift, so the sign is inert.
  */
case class SimhashOf(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_of"

  override def nullSafeEval(input: Any): Any = {
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    // String.split(" ", -1) matches Spark's split(c, " ") exactly,
    // including empty tokens from consecutive/trailing spaces
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      md.reset()
      val d = md.digest(words(w).getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars == bytes 0-3 unsigned; chars 9-16 == bytes 4-7
      val hLo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val hHi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var j = 0
      while (j < 32) {
        counts(j) += (if (((hLo >> j) & 1L) == 1L) 1 else -1)
        counts(j + 32) += (if (((hHi >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      w += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sh |= (1L << j)
      j += 1
    }
    sh
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashOf {
  def apply(c: Column): Column =
    ColumnGlue.column(new SimhashOf(ColumnGlue.expression(c)))
}
