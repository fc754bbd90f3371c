package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductD, SortedIntersectCount}

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
  }
}
