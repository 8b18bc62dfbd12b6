package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable polynomial string hashing.
  *
  * The dedup operators key every shuffle/join on a hash of the shingle
  * string. Spark's `xxhash64` is fast but not reproducible outside the
  * JVM, which forced the MinHash/SimHash operators (q32/q33) down to
  * rows-only driver checks. This 62-bit polynomial hash is defined by
  * arithmetic any ANSI engine evaluates identically — two independent
  * 31-bit Horner folds over the string's code points, packed into one
  * long — so the DuckDB oracle reproduces signatures, bands and
  * Hamming distances bit-for-bit and the full pipelines become
  * hash-checkable.
  *
  *   h1 = fold(acc * 31 + codepoint) mod (2^31 - 1)
  *   h2 = fold(acc * 37 + codepoint) mod (2^31 - 1)
  *   h  = h1 * 2^31 + h2                          (in [0, 2^62))
  *
  * All intermediates fit a signed 64-bit integer (acc < 2^31, so
  * acc * 37 + cp < 2^37), which is exactly what makes the same fold
  * expressible in DuckDB BIGINT arithmetic (see DedupSimQueries'
  * oracle SQL).
  *
  * Collision regimes — the 62-bit birthday bound applies ONLY to uses
  * that compare the full packed hash (shingle equality joins:
  * q31/q32's verify, q55, q63). The MinHash permutations reduce to
  * h mod P first, so THAT path is 31-bit: above ~2^31 distinct
  * shingles collisions are forced, and signature-only estimates
  * (q66) acquire a small upward bias. q32 is immune (exact verify on
  * candidates); a corpus at that scale should widen the permutation
  * input (two independent 31-bit mulmods) before trusting q66's
  * estimates unverified.
  */
object PortableHash {

  /** Mersenne prime 2^31 - 1: the modulus of both folds and of every
    * MinHash permutation downstream.
    */
  val P: Long = 2147483647L

  val Base1: Long = 31L
  val Base2: Long = 37L

  /** Deterministic MinHash permutation coefficients in [1, P):
    * perm_p(h) = (A(p) * (h mod P) + B(p)) mod P. Derived from a
    * splitmix-style integer recurrence so they are reproducible
    * constants — the oracle SQL embeds the same values as literals.
    */
  def permA(p: Int): Long = mix(2L * p + 1L)
  def permB(p: Int): Long = mix(2L * p + 2L)

  private def mix(i: Long): Long = {
    var x = i * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 31)
    // into [1, P): the multiplier must be non-zero mod P
    ((x & Long.MaxValue) % (P - 1)) + 1
  }

  /** The fold, callable from generated code (static forwarder). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * Base1 + cp) % P
      h2 = (h2 * Base2 + cp) % P
      i += Character.charCount(cp)
    }
    h1 * 2147483648L + h2
  }
}

/** `graft_strhash2(string) -> bigint` — see [[PortableHash]]. */
case class StrHash2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"graft_strhash2 requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_strhash2"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StrHash2 =
    copy(child = newChild)
}
