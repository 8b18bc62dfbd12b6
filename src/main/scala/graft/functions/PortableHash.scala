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
  * Collision regimes — the 62-bit birthday bound applies to every
  * consumer: shingle equality joins (q31/q32's verify, q55, q63)
  * compare the full packed hash, and the MinHash permutations consume
  * BOTH 31-bit halves (two independent mulmods, [[perm]]), so two
  * distinct shingles permute identically only if they collide in the
  * full 62-bit hash. Signature-only estimates (q66) therefore carry
  * no 31-bit truncation bias.
  */
object PortableHash {

  /** Signature format version. Any change to the hash fold, the
    * permutation scheme, or the coefficient seeds (e.g. r4's
    * mix(2p+·) → mix(3p+·) reseed alongside the two-mulmod widening)
    * changes EVERY MinHash signature value — a persisted signature
    * index built under one version silently produces garbage
    * candidates under another. Persisted indexes must therefore carry
    * this version (Dedup.writeSignatureIndex stamps it as a table
    * property; Dedup.readSignatureIndex refuses a mismatch) so a
    * format break fails loudly
    * at read time instead of corrupting dedup decisions. Bump on ANY
    * signature-affecting change.
    */
  val SignatureFormatVersion: Int = 2

  /** Mersenne prime 2^31 - 1: the modulus of both folds and of every
    * MinHash permutation downstream.
    */
  val P: Long = 2147483647L

  val Base1: Long = 31L
  val Base2: Long = 37L

  /** Low-half mask: h mod 2^31. */
  val Mask31: Long = 0x7FFFFFFFL

  /** Domain mask: [[perm]]'s overflow-freedom proof needs h in
    * [0, 2^62) — every [[hash]] output qualifies, but `graft_minhash`
    * is a registered SQL aggregate that accepts ANY bigint (e.g. a
    * negative xxhash64), so inputs are masked to their low 62 bits
    * first: identity on legitimate inputs, total (garbage-in,
    * defined-out) on the rest instead of a silent signed overflow.
    */
  val Mask62: Long = 0x3FFFFFFFFFFFFFFFL

  /** Deterministic MinHash permutation coefficients in [1, P) — see
    * [[perm]]. Derived from a splitmix-style integer recurrence so
    * they are reproducible constants — the oracle SQL embeds the same
    * values as literals.
    */
  def permA(p: Int): Long = mix(3L * p + 1L)
  def permB(p: Int): Long = mix(3L * p + 2L)
  def permC(p: Int): Long = mix(3L * p + 3L)

  /** MinHash permutation consuming the FULL 62-bit hash as two
    * independent 31-bit mulmods:
    *
    *   perm_p(h) = (A_p * (h div 2^31)) mod P
    *             + (B_p * (h mod 2^31)) mod P
    *             + C_p                        , all mod P
    *
    * Each product < 2^62 and the final sum < 3 * 2^31, so every
    * intermediate stays in signed-64 range — the same expression runs
    * in DuckDB BIGINT arithmetic (DedupSimQueries.permSql). Using both
    * halves (not h mod P) means two shingles permute identically only
    * on a full 62-bit hash collision; a (h mod P)-input permutation
    * would be 31-bit and bias q66's estimates above ~2^31 shingles.
    */
  def perm(a: Long, b: Long, c: Long, h: Long): Long = {
    val hm = h & Mask62
    permParts(a, b, c, hm >>> 31, hm & Mask31)
  }

  /** [[perm]] on a pre-split hash — the per-row aggregate loops
    * (MinHash/CMS/Bloom) split hi/lo ONCE and run this per
    * permutation row. Every interpreted consumer of the permutation
    * goes through here, so the arithmetic cannot silently diverge
    * between sketches (the codegen template in BloomContains and the
    * oracle permSql mirror it textually).
    */
  @inline def permParts(a: Long, b: Long, c: Long, hi: Long, lo: Long): Long =
    ((a * hi) % P + (b * lo) % P + c) % P

  private def mix(i: Long): Long = {
    var x = i * 6364136223846793005L + 1442695040888963407L
    x ^= (x >>> 31)
    // into [1, P): the multiplier must be non-zero mod P
    ((x & Long.MaxValue) % (P - 1)) + 1
  }

  /** The DuckDB rendering of [[hash]] over an SQL string expression —
    * THE canonical oracle twin (list_reduce seeds with the first
    * element, which equals the fold-from-zero first step since code
    * points are < P). Lives here so every query file's oracle embeds
    * the same arithmetic; any drift between this and [[hash]] breaks
    * every hash-keyed oracle at once, loudly.
    */
  def strhash2Sql(s: String): String = {
    def fold(base: Long) =
      s"list_reduce(list_transform(range(1, length($s) + 1), i -> CAST(ord(substr($s, CAST(i AS INT), 1)) AS BIGINT)), " +
        s"(acc, c) -> (acc * $base + c) % $P)"
    s"(CASE WHEN length($s) = 0 THEN 0 ELSE ${fold(Base1)} * 2147483648 + ${fold(Base2)} END)"
  }

  /** The fold, callable from generated code (static forwarder). */
  def hash(s: UTF8String): Long = foldString(0L, s.toString)

  /** Continuable form of [[hash]]: fold `str`'s code points into a
    * running state and return the new state. The state IS the packed
    * hash (h1 · 2³¹ + h2 = h1 << 31 | h2, since both halves are < P
    * < 2³¹) — so `foldString(0, s) == hash(s)`, and a multi-token
    * string can be hashed WITHOUT materializing the joined string:
    * fold each token, with `foldCodePoint(state, ' ')` between them
    * (exactly what concat_ws(" ", …) would have inserted). This is
    * what lets [[ShingleSet]] hash every n-gram of a document in-row
    * with zero string concatenation.
    */
  @inline def foldString(state: Long, str: String): Long = {
    var h1 = state >>> 31
    var h2 = state & Mask31
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * Base1 + cp) % P
      h2 = (h2 * Base2 + cp) % P
      i += Character.charCount(cp)
    }
    (h1 << 31) | h2
  }

  /** One code-point step of [[foldString]]. */
  @inline def foldCodePoint(state: Long, cp: Int): Long = {
    val h1 = ((state >>> 31) * Base1 + cp) % P
    val h2 = ((state & Mask31) * Base2 + cp) % P
    (h1 << 31) | h2
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
