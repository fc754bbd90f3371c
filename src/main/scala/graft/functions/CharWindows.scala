package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All rolling `n`-code-point windows of a text, in one pass —
  * column-for-column identical to
  * `transform(sequence(1, length(c)-(n-1)), i -> substr(c, i, n))`
  * (asserted in the spec, astral text included: windows advance by
  * CODE POINT, the unit `substr`/`length` count in both engines), but
  * without the interpreted per-element lambda: the per-doc cost is one
  * tight loop sharing one code-point index array instead of
  * ~n_chars virtual substr calls. Returns an empty array when the text
  * is shorter than one window. Feeds [[graft.ext.Dedup.repeatedPassages]].
  */
case class CharWindows(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "window must be at least 1 code point")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_windows"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // offsets(i) = UTF-16 index of code point i; offsets(cpCount) = end
    val offsets = new Array[Int](s.length + 1)
    var i = 0
    var cpCount = 0
    while (i < s.length) {
      offsets(cpCount) = i
      i += Character.charCount(s.codePointAt(i))
      cpCount += 1
    }
    offsets(cpCount) = s.length
    val m = cpCount - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) = UTF8String.fromString(s.substring(offsets(i), offsets(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharWindows {
  def apply(c: Column, n: Int): Column =
    ColumnGlue.column(new CharWindows(ColumnGlue.expression(c), n))
}
