package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the LONGEST vocabulary unit prefixing `word` at 0-based
  * `pos` (0 when none) — the per-position probe of the greedy
  * WordPiece walk, as ONE codegen'd trie descent.
  *
  * The flat walk probes O(|vocab|) units per position and the t43
  * first-char buckets cut that to O(|vocab|/alphabet); at a deployed
  * 30k-unit vocabulary both still scan unit lists. The trie descent is
  * O(longest unit) per position, independent of |vocab| — the shape a
  * production tokenizer actually ships. The trie is built ONCE on the
  * driver from the trained units (the merges-are-the-model bounded
  * collect) and rides into codegen as two flat reference arrays:
  * `next` (node*26 + letter → child, −1 absent) and `accept`
  * (node → a unit ends here).
  *
  * Byte-vs-char invariant: units are lowercase ascii (the t17
  * dictionary contract, enforced by the caller), so a match never
  * spans a multi-byte char and any position reached by matches has
  * byte offset == char offset — walking UTF8 BYTES is exactly the
  * walk the SQL `substring` forms take, with zero decoding.
  */
case class LongestUnitMatch(word: Expression, pos: Expression,
                            next: IndexedSeq[Int],
                            accept: IndexedSeq[Boolean])
    extends BinaryExpression {

  require(next.length == accept.length * 26 && accept.nonEmpty,
    "next must hold 26 branches per node")

  override def left: Expression = word
  override def right: Expression = pos
  override def dataType: DataType = IntegerType
  override def prettyName: String = "longest_unit_match"

  @transient private lazy val nextArr: Array[Int] = next.toArray
  @transient private lazy val acceptArr: Array[Boolean] = accept.toArray

  override def nullSafeEval(w: Any, p: Any): Any = {
    val s = w.asInstanceOf[UTF8String]
    val start = p.asInstanceOf[Int]
    var i = start; var node = 0; var best = 0
    val nBytes = s.numBytes()
    while (i < nBytes && node >= 0) {
      val c = s.getByte(i) - 'a'
      if (c < 0 || c > 25) node = -2
      else {
        node = nextArr(node * 26 + c)
        if (node >= 0) {
          i += 1
          if (acceptArr(node)) best = i - start
        }
      }
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p) => {
      val nextRef = ctx.addReferenceObj("trieNext", nextArr, "int[]")
      val acceptRef = ctx.addReferenceObj("trieAccept", acceptArr, "boolean[]")
      val i = ctx.freshName("i"); val node = ctx.freshName("node")
      val best = ctx.freshName("best"); val c = ctx.freshName("c")
      val nb = ctx.freshName("nb")
      s"""
         |int $i = $p; int $node = 0; int $best = 0;
         |final int $nb = $w.numBytes();
         |while ($i < $nb && $node >= 0) {
         |  int $c = $w.getByte($i) - 97;
         |  if ($c < 0 || $c > 25) { $node = -2; }
         |  else {
         |    $node = $nextRef[$node * 26 + $c];
         |    if ($node >= 0) {
         |      $i++;
         |      if ($acceptRef[$node]) { $best = $i - $p; }
         |    }
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(word = newLeft, pos = newRight)
}

object LongestUnitMatch {

  /** Build the flat-array trie for lowercase-ascii `units`:
    * (next, accept) with node 0 the root and −1 marking an absent
    * branch. Size is Σ|unique prefixes| nodes — bounded by the total
    * unit characters, the same envelope as the unit literal itself.
    */
  def buildTrie(units: Seq[String]): (IndexedSeq[Int], IndexedSeq[Boolean]) = {
    require(units.nonEmpty && units.forall(_.matches("^[a-z]+$")),
      "units must be non-empty lowercase ascii")
    val next = scala.collection.mutable.ArrayBuffer.fill(26)(-1)
    val accept = scala.collection.mutable.ArrayBuffer(false)
    for (u <- units) {
      var node = 0
      for (ch <- u) {
        val slot = node * 26 + (ch - 'a')
        if (next(slot) < 0) {
          next(slot) = accept.length
          next ++= Seq.fill(26)(-1)
          accept += false
        }
        node = next(slot)
      }
      accept(node) = true
    }
    (next.toIndexedSeq, accept.toIndexedSeq)
  }

  /** The probe as a Column over (word, 0-based pos) for a fixed unit
    * set.
    */
  def of(word: Column, pos: Column, units: Seq[String]): Column = {
    val (next, accept) = buildTrie(units)
    ColumnGlue.column(LongestUnitMatch(
      ColumnGlue.expression(word), ColumnGlue.expression(pos), next, accept))
  }
}
