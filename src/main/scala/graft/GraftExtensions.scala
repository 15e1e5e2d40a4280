package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      bloomAggBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      mightContainBuilder))
  }
}

object GraftExtensions {
  private def intArg(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue()
  private def longArg(e: Expression): Long = e.eval(null).asInstanceOf[Number].longValue()

  val dotBuilder: Seq[Expression] => Expression =
    args => DotProduct(args(0), args(1))

  val minhashBuilder: Seq[Expression] => Expression =
    args => MinHashAgg(args(0), intArg(args(1)), intArg(args(2))).toAggregateExpression()

  val fingerprintBuilder: Seq[Expression] => Expression =
    args => Md5Fingerprint(args(0))

  /** `graft_bloom_agg(hash[, items[, bits]])` — Spark's internal
    * BloomFilterAggregate (otherwise reachable only through the runtime
    * join-filter optimizer rule) surfaced as a SQL aggregate. Child must be
    * a BIGINT hash (pair with xxhash64). */
  val bloomAggBuilder: Seq[Expression] => Expression = args => {
    val items = if (args.length >= 2) longArg(args(1)) else 1000000L
    val bits = if (args.length >= 3) longArg(args(2)) else items * 8L
    new BloomFilterAggregate(args(0), Literal(items), Literal(bits))
      .toAggregateExpression()
  }

  /** `graft_might_contain(bloom, hash)` — codegen'd membership probe; the
    * bloom argument must be foldable (a literal or scalar subquery). */
  val mightContainBuilder: Seq[Expression] => Expression =
    args => BloomFilterMightContain(args(0), args(1))

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "graft_dot", dotBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_minhash", minhashBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_fingerprint", fingerprintBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_bloom_agg", bloomAggBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_might_contain", mightContainBuilder)
  }
}
