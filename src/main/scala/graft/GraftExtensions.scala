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
    ext.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[graft.functions.CmsEstimate].getName, "graft_cms_estimate"),
      cmsEstimateBuilder))
  }
}

object GraftExtensions {
  /** Arity guard for a SQL builder: a wrong-arg-count call gets a clear
    * analysis-time error naming the signature, not an
    * IndexOutOfBoundsException from `args(n)`. */
  private def arity(args: Seq[Expression], ok: Int => Boolean, sig: String): Unit =
    if (!ok(args.length))
      throw new IllegalArgumentException(
        s"$sig — got ${args.length} argument(s)")

  /** Parameter arguments (sizes, counts) must be FOLDABLE: `eval(null)` on a
    * column reference would NPE (or silently mis-size) at analysis time. */
  private def foldableNum(e: Expression, fn: String, pos: Int): Number = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be a foldable literal, got: ${e.sql}")
    e.eval(null) match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"$fn: argument $pos must be numeric, got: $other")
    }
  }
  private def intArg(e: Expression, fn: String, pos: Int): Int = foldableNum(e, fn, pos).intValue()
  private def longArg(e: Expression, fn: String, pos: Int): Long = foldableNum(e, fn, pos).longValue()

  val dotBuilder: Seq[Expression] => Expression = args => {
    arity(args, _ == 2, "graft_dot(a, b) takes 2 arguments")
    DotProduct(args(0), args(1))
  }

  val minhashBuilder: Seq[Expression] => Expression = args => {
    arity(args, _ == 3, "graft_minhash(shingles, numHashes, numTokens) takes 3 arguments")
    MinHashAgg(args(0), intArg(args(1), "graft_minhash", 2),
      intArg(args(2), "graft_minhash", 3)).toAggregateExpression()
  }

  val fingerprintBuilder: Seq[Expression] => Expression = args => {
    arity(args, _ == 1, "graft_fingerprint(text) takes 1 argument")
    Md5Fingerprint(args(0))
  }

  /** `graft_bloom_agg(hash[, items[, bits]])` — Spark's internal
    * BloomFilterAggregate (otherwise reachable only through the runtime
    * join-filter optimizer rule) surfaced as a SQL aggregate. Child must be
    * a BIGINT hash (pair with xxhash64). */
  val bloomAggBuilder: Seq[Expression] => Expression = args => {
    arity(args, n => n >= 1 && n <= 3,
      "graft_bloom_agg(hash[, items[, bits]]) takes 1-3 arguments")
    val items = if (args.length >= 2) longArg(args(1), "graft_bloom_agg", 2) else 1000000L
    val bits = if (args.length >= 3) longArg(args(2), "graft_bloom_agg", 3) else items * 8L
    new BloomFilterAggregate(args(0), Literal(items), Literal(bits))
      .toAggregateExpression()
  }

  /** `graft_might_contain(bloom, hash)` — codegen'd membership probe; the
    * bloom argument must be foldable (a literal or scalar subquery). */
  val mightContainBuilder: Seq[Expression] => Expression = args => {
    arity(args, _ == 2, "graft_might_contain(bloom, hash) takes 2 arguments")
    BloomFilterMightContain(args(0), args(1))
  }

  /** `graft_cms_estimate(sketch, item)` — point-estimate probe for the
    * built-in `count_min_sketch` aggregate's serialized bytes (which have
    * no reader on the stock SQL surface). Sketch must be foldable. */
  val cmsEstimateBuilder: Seq[Expression] => Expression = args => {
    arity(args, _ == 2, "graft_cms_estimate(sketch, item) takes 2 arguments")
    graft.functions.CmsEstimate(args(0), args(1))
  }

  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "graft_dot", dotBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_minhash", minhashBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_fingerprint", fingerprintBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_bloom_agg", bloomAggBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_might_contain", mightContainBuilder)
    GraftSqlBridge.registerFunction(spark, "graft_cms_estimate", cmsEstimateBuilder)
  }
}
