package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The per-document DISTINCT shingle-hash set, computed entirely
  * in-row: `graft_shingleset(tokens, n)` → sorted array<long> of the
  * [[PortableHash]] hashes of the document's word n-grams.
  *
  * Why this exists (round 17, the q32 scale lever): `Dedup.shingles`
  * used to be explode-all-positions THEN a corpus-wide
  * `distinct()` on (doc_id, shingle). Intra-document repeats are the
  * ONLY duplicates that distinct can remove — the pair key contains
  * doc_id — so the whole corpus-wide shuffle (and its hash-aggregate
  * state of every (doc_id, shingle) pair, the engine's heaviest
  * frame: ~139M rows and 52 GiB of externally-sorted spill at the
  * 512× decade, OOM at 2048×) existed to deduplicate WITHIN rows.
  * This expression does that deduplication where the data already
  * is: hash every n-gram start, sort the row's ~doc-length long[]
  * and drop adjacent repeats. The explode that follows produces the
  * exact same (doc_id, shingle) set with ZERO shuffle.
  *
  * Semantics parity with the old formulation (pinned by
  * DedupSimSpec): each start i ∈ [0, max(len−n+1, 1)) hashes the
  * space-joined tokens i..min(i+n, len) — for docs shorter than n
  * tokens that is one shingle of the whole doc — and the hash folds
  * token code points with a single ' ' between tokens, exactly the
  * fold [[PortableHash.hash]] applies to the concat_ws(" ", …)
  * string (null tokens are skipped, as concat_ws does). No joined
  * string is ever materialized.
  *
  * Output order is ASCENDING hash (a set has no inherent order; the
  * sort both enables the in-place dedupe and gives downstream
  * consumers a deterministic row order after explode). A null token
  * ARRAY yields null (callers coalesce the text to '' first when the
  * old emit-hash-of-empty behavior matters).
  *
  * Reference: gerrydb-etl's dedup unit is the whole row
  * (pl_geo.py:114); the shingle set is the fuzzy-dedup refinement,
  * and at 100 TB its construction must not shuffle — which is the
  * entire point of this Expression.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        if (n < 1) TypeCheckResult.TypeCheckFailure(s"graft_shingleset n must be >= 1, got $n")
        else TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_shingleset requires array<string>, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingleset"

  override protected def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  /** Static evaluator shared by interpreted eval and codegen (the
    * [[StrHash2]] pattern — the generated code is one call, not an
    * inlined loop, so the enclosing stage's method stays JIT-sized).
    * NOT named `eval`: the case class inherits Expression.eval, which
    * suppresses the companion's static forwarder and janino then
    * resolves the generated call against the instance method — a
    * codegen compile error that silently falls back to interpreted.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val starts = math.max(sz - (n - 1), 1)
    // toString each token ONCE per row, not once per covering shingle
    val strs = new Array[String](math.min(sz, starts + n - 1))
    var t = 0
    while (t < strs.length) {
      if (!toks.isNullAt(t)) strs(t) = toks.getUTF8String(t).toString
      t += 1
    }
    val out = new Array[Long](starts)
    var s = 0
    while (s < starts) {
      var state = 0L
      var emitted = false
      val end = math.min(s + n, sz)
      var j = s
      while (j < end) {
        val str = strs(j)
        if (str != null) {
          if (emitted) state = PortableHash.foldCodePoint(state, ' ')
          state = PortableHash.foldString(state, str)
          emitted = true
        }
        j += 1
      }
      out(s) = state
      s += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 1
    while (r < starts) {
      if (out(r) != out(w)) { w += 1; out(w) = out(r) }
      r += 1
    }
    val len = w + 1
    new GenericArrayData(if (len == starts) out else java.util.Arrays.copyOf(out, len))
  }
}
