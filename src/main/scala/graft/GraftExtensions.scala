package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Md5Fingerprint, MinHashAgg}

/** SQL-facing registration of graft's custom Catalyst expressions:
  * `graft_dot(a, b)`, `graft_minhash(shingles, numHashes, k)`, and
  * `graft_fingerprint(text)`.
  *
  * Two hooks, same builders:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) at session build;
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      dotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      minhashBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Md5Fingerprint].getName, "graft_fingerprint"),
      fingerprintBuilder))
  }
}

object GraftExtensions {
  private def intArg(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue()

  val dotBuilder: Seq[Expression] => Expression =
    args => DotProduct(args(0), args(1))

  val minhashBuilder: Seq[Expression] => Expression =
    args => MinHashAgg(args(0), intArg(args(1)), intArg(args(2))).toAggregateExpression()

  val fingerprintBuilder: Seq[Expression] => Expression =
    args => Md5Fingerprint(args(0))

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "graft_dot", dotBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_minhash", minhashBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_fingerprint", fingerprintBuilder)
  }
}
