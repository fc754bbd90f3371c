package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Native Catalyst expression for the similarity hot path.
  *
  * The higher-order-function dot product (zip_with + aggregate) is
  * interpreted per element — fine for one-off projections, ~60x too
  * slow for the 2M-pair cosine-dedup join at bench scale. This
  * expression generates a tight Java loop inside whole-stage codegen.
  *
  * The fold is the same IEEE sequence as the HOF version and the DuckDB
  * oracle's list_reduce (((0 + p0) + p1) + ... in double), so results
  * stay bit-identical — swapping it in does not move a single hash in
  * the correctness gate.
  *
  * Assumes equal-length, null-free float arrays (the embeddings table
  * contract); extra elements on the longer side are ignored.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Signed-sum projection of an array<float> vector by a LITERAL ±1
  * matrix (the Achlioptas JL form, [[graft.ext.Similarity.jlProject]]).
  * Output k = fold over input dims j of acc ± x(j) in double, stored
  * back as float — the same IEEE sequence as the former inlined
  * per-coordinate literal chain (±1 * x is exact, so acc + s*x ≡
  * acc ± x bit-for-bit) and as the DuckDB oracle's literal chain.
  *
  * The matrix rides along as ONE broadcast-referenced int[] instead of
  * outDims x inDims literal expression nodes: the former 1024-node tree
  * serialized multi-MiB task binaries per stage; this is a constant-size
  * plan node at any matrix size.
  */
case class MatProjectF(child: Expression, signs: Seq[Seq[Int]])
    extends UnaryExpression {

  private val outDims = signs.length
  private val inDims = if (signs.isEmpty) 0 else signs.head.length
  @transient private lazy val flat: Array[Int] = signs.flatten.toArray

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_project_f"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() < inDims) return null
    val out = new Array[Float](outDims)
    var k = 0
    while (k < outDims) {
      var acc = 0.0
      val base = k * inDims
      var j = 0
      while (j < inDims) {
        acc += flat(base + j) * x.getFloat(j).toDouble
        j += 1
      }
      out(k) = acc.toFloat
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sg = ctx.addReferenceObj("matProjectSigns", flat, "int[]")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() < $inDims) {
         |  ${ev.isNull} = true;
         |} else {
         |  float[] $out = new float[$outDims];
         |  for (int $k = 0; $k < $outDims; $k++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $inDims; $j++) {
         |      $acc += $sg[$k * $inDims + $j] * (double) $a.getFloat($j);
         |    }
         |    $out[$k] = (float) $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-L2 distance of an array<double> vector to EVERY centroid of
  * a LITERAL (cluster_id, centroid) matrix, as
  * array<struct<dist2: double, cluster: bigint>> in the matrix's order.
  * Each dist2 is the left-to-right double fold of (x_j - c_j)^2 — the
  * same IEEE sequence as the former aggregate(zip_with(...)) HOF chain
  * and the DuckDB oracle — and the field order (dist2, cluster) makes
  * array_min over the result the nearest-centroid argmin with ties to
  * the lowest cluster id, exactly as before. One broadcast-referenced
  * double[] replaces k x dims literal nodes and k interpreted HOF
  * evaluations per row ([[graft.ext.Similarity]] Lloyd/PQ paths).
  */
case class CentroidDistancesD(child: Expression, cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression {

  private val k = cents.length
  private val dims = if (cents.isEmpty) 0 else cents.head._2.length
  @transient private lazy val flat: Array[Double] = cents.flatMap(_._2).toArray
  @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("cluster", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_distances_d"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() < dims) return null
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dims
      var j = 0
      while (j < dims) {
        val d = x.getDouble(j) - flat(base + j)
        acc += d * d
        j += 1
      }
      out(c) = InternalRow(acc, cids(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ce = ctx.addReferenceObj("centroids", flat, "double[]")
      val ci = ctx.addReferenceObj("centroidIds", cids, "long[]")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() < $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  Object[] $out = new Object[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $dims; $j++) {
         |      double $d = $a.getDouble($j) - $ce[$c * $dims + $j];
         |      $acc += $d * $d;
         |    }
         |    $out[$c] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $acc, $ci[$c] });
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-pattern LSH bucket id of an array<float> vector against LITERAL
  * hyperplanes: bit j set iff dot(v, plane_j) > 0, dots folded exactly
  * as [[DotProductD]] (min-length loop, double accumulate). One
  * broadcast-referenced float[] replaces nPlanes literal-array dot
  * nodes ([[graft.ext.Similarity.hyperplaneBucket]]).
  */
case class HyperplaneBucketL(child: Expression, planes: Seq[Seq[Float]])
    extends UnaryExpression {

  private val nPlanes = planes.length
  private val dims = if (planes.isEmpty) 0 else planes.head.length
  @transient private lazy val flat: Array[Float] = planes.flatten.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket_l"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dims)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val base = p * dims
      var j = 0
      while (j < n) {
        acc += x.getFloat(j).toDouble * flat(base + j).toDouble
        j += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("hyperplanes", flat, "float[]")
      val n = ctx.freshName("n")
      val bkt = ctx.freshName("bkt")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $dims);
         |long $bkt = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += ((double) $a.getFloat($j)) * ((double) $pl[$p * $dims + $j]);
         |  }
         |  if ($acc > 0) $bkt |= 1L << $p;
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Register the SQL-callable form (dot_product_d(a, b)); idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_d", exprs => DotProductD(exprs(0), exprs(1)), "built-in")

  /** Column API: codegen'd dot product of two array<float> columns. */
  def dotD(a: Column, b: Column): Column =
    ColumnGlue.column(
      DotProductD(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Codegen'd L2 norm of an array<float> column. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Codegen'd ±1-matrix projection of an array<float> column. */
  def matProject(a: Column, signs: Seq[Seq[Int]]): Column =
    ColumnGlue.column(MatProjectF(ColumnGlue.expression(a), signs))

  /** Codegen'd per-centroid squared distances of an array<double> column. */
  def centroidDistances(a: Column, cents: Seq[(Long, Seq[Double])]): Column =
    ColumnGlue.column(CentroidDistancesD(ColumnGlue.expression(a), cents))

  /** Codegen'd hyperplane sign-bucket id of an array<float> column. */
  def hyperplaneBucket(a: Column, planes: Seq[Seq[Float]]): Column =
    ColumnGlue.column(HyperplaneBucketL(ColumnGlue.expression(a), planes))
}
