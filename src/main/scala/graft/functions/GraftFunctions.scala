package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registry glue for graft's native expressions.
  *
  * Production path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) — the standard
  * SparkSessionExtensions hook, so `graft_dot` is available to
  * `spark.sql(...)` as well as the DataFrame API. For sessions built
  * without the extension (tests, the driver's plain sessions),
  * [[GraftFunctions.ensureRegistered]] is an idempotent runtime
  * registration into the session's FunctionRegistry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // rewrite interpreted aggregate(zip_with(..)) dot products into the
    // native codegen'd expression (bit-exact; see RewriteDotProduct)
    ext.injectOptimizerRule(_ => new graft.plans.RewriteDotProduct)
  }
}

object GraftFunctions {

  private def lit(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dot(a, b) takes 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_strhash2"),
      new ExpressionInfo(classOf[StrHash2].getName, "graft_strhash2"),
      (children: Seq[Expression]) => StrHash2(children.head)
    ),
    (
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_minhash(hash, numPerms) takes 2 arguments, got ${children.size}")
        MinHashAgg(children.head, lit(children(1)))
      }
    ),
    (
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashAgg(children.head)
    ),
    (
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsAgg].getName, "graft_cms"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"graft_cms(hash, depth, width) takes 3 arguments, got ${children.size}")
        CmsAgg(children.head, lit(children(1)), lit(children(2)))
      }
    ),
    (
      FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"graft_bloom(hash, numBits, numHashes) takes 3 arguments, got ${children.size}")
        BloomAgg(children.head, lit(children(1)), lit(children(2)))
      }
    ),
    (
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(
          children.size == 3,
          s"graft_bloom_contains(bloom, hash, numHashes) takes 3 arguments, got ${children.size}"
        )
        BloomContains(children.head, children(1), lit(children(2)))
      }
    ),
    (
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"graft_topk(key, id, k) takes 3 arguments, got ${children.size}")
        TopKAgg(children.head, children(1), lit(children(2)))
      }
    ),
    (
      FunctionIdentifier("graft_sigmatch"),
      new ExpressionInfo(classOf[SigMatch].getName, "graft_sigmatch"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_sigmatch(a, b) takes 2 arguments, got ${children.size}")
        SigMatch(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_doti"),
      new ExpressionInfo(classOf[DotShifted].getName, "graft_doti"),
      (children: Seq[Expression]) => {
        require(children.size == 3, s"graft_doti(a, b, shift) takes 3 arguments, got ${children.size}")
        DotShifted(children.head, children(1), lit(children(2)))
      }
    ),
    (
      FunctionIdentifier("graft_dist2i"),
      new ExpressionInfo(classOf[Dist2Long].getName, "graft_dist2i"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_dist2i(a, b) takes 2 arguments, got ${children.size}")
        Dist2Long(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_min2"),
      new ExpressionInfo(classOf[MinTop2Agg].getName, "graft_min2"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_min2(key, id) takes 2 arguments, got ${children.size}")
        MinTop2Agg(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_minkp"),
      new ExpressionInfo(classOf[MinKPackedAgg].getName, "graft_minkp"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_minkp(packedKey, k) takes 2 arguments, got ${children.size}")
        MinKPackedAgg(children.head, children(1))
      }
    ),
    (
      FunctionIdentifier("graft_shingleset"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingleset"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"graft_shingleset(tokens, n) takes 2 arguments, got ${children.size}")
        ShingleSet(children.head, lit(children(1)))
      }
    ),
    (
      FunctionIdentifier("graft_lshbuckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lshbuckets"),
      (children: Seq[Expression]) => {
        require(
          children.size == 3,
          s"graft_lshbuckets(v, planes, planesPerTable) takes 3 arguments, got ${children.size}"
        )
        LshBuckets(children.head, children(1), lit(children(2)))
      }
    )
  )

  /** Idempotently register graft's functions in an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptors.foreach { d =>
      if (!registry.functionExists(d._1)) registry.registerFunction(d._1, d._2, d._3)
    }
  }

  /** Column-API entry points; require the functions registered in the
    * resolving session (extension or ensureRegistered).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def strhash2(s: Column): Column = call_function("graft_strhash2", s)

  def minhash(h: Column, numPerms: Int): Column =
    call_function("graft_minhash", h, org.apache.spark.sql.functions.lit(numPerms))

  def simhash(h: Column): Column = call_function("graft_simhash", h)

  def sigmatch(a: Column, b: Column): Column = call_function("graft_sigmatch", a, b)

  def topk(key: Column, id: Column, k: Int): Column =
    call_function("graft_topk", key, id, org.apache.spark.sql.functions.lit(k))

  def bloom(h: Column, numBits: Int, numHashes: Int): Column =
    call_function(
      "graft_bloom",
      h,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes)
    )

  def bloomContains(bloom: Column, h: Column, numHashes: Int): Column =
    call_function("graft_bloom_contains", bloom, h, org.apache.spark.sql.functions.lit(numHashes))

  def cms(h: Column, depth: Int, width: Int): Column =
    call_function(
      "graft_cms",
      h,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width)
    )

  /** Centered integer dot Σ (a_i−shift)(b_i−shift) over array<bigint>. */
  def dotiShifted(a: Column, b: Column, shift: Int): Column =
    call_function("graft_doti", a, b, org.apache.spark.sql.functions.lit(shift))

  /** Integer squared L2 distance Σ (a_i−b_i)² over array<bigint>. */
  def dist2i(a: Column, b: Column): Column = call_function("graft_dist2i", a, b)

  /** Top-2 lexicographic minima of (key, id) with distinct ids, as
    * array<bigint> [k1, id1, k2, id2] (Long.MaxValue sentinels).
    */
  def min2(key: Column, id: Column): Column = call_function("graft_min2", key, id)

  /** K smallest values of a packed BIGINT key, ascending, as
    * array<bigint> (Long.MaxValue sentinels) — the
    * HashAggregate-friendly top-K (see [[MinKPackedAgg]] for when to
    * prefer it over the typed min2).
    */
  def minkp(packed: Column, k: Int): Column =
    call_function("graft_minkp", packed, org.apache.spark.sql.functions.lit(k))

  /** Sorted distinct word-n-gram hash set of a token array, in-row
    * (the q32-family shuffle killer — see [[ShingleSet]]).
    */
  def shingleset(toks: Column, n: Int): Column =
    call_function("graft_shingleset", toks, org.apache.spark.sql.functions.lit(n))

  /** All LSH table buckets of `v` from a constant plane matrix (rows
    * in table-major order: table t's planes occupy rows
    * t·planesPerTable until (t+1)·planesPerTable).
    */
  def lshBuckets(v: Column, planes: Seq[Seq[Double]], planesPerTable: Int): Column =
    call_function(
      "graft_lshbuckets",
      v,
      org.apache.spark.sql.functions.typedlit(planes),
      org.apache.spark.sql.functions.lit(planesPerTable)
    )
}
