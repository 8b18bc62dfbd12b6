package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis as pure Column trees — token counting, quality
  * scoring, stopword-heuristic language ID, rolling-hash fingerprints.
  *
  * The reference cleans and normalizes census strings
  * (gerrydb_etl/bootstrap/pl_geo.py:103-107, __init__.py:59 pathify);
  * these operators extend that string layer to the document analytics a
  * training-data pipeline needs. Everything is a codegen'd builtin —
  * `regexp_count`, `split`, higher-order `aggregate` — no UDFs, so the
  * hot path stays inside WholeStageCodegen at 100 TB.
  */
object TextFunctions {

  /** Explicit whitespace class. Java regex `\s` is `[ \t\n\x0B\f\r]`
    * but DuckDB's RE2 `\s` excludes `\x0B`, so a corpus containing a
    * vertical tab would tokenize differently in the oracle. Every
    * tokenizer/counter on BOTH engines uses this class verbatim — the
    * engines agree by construction, not by corpus luck.
    */
  val WsClass: String = "[ \\t\\n\\x0B\\f\\r]"

  /** A run of whitespace: the token delimiter. */
  val WsRun: String = WsClass + "+"

  /** Whitespace token count: split on runs of whitespace after trim. */
  def tokenCountWs(text: Column): Column = size(split(trim(text), WsRun))

  /** BPE-ish token count: maximal runs of lowercase alphanumerics. */
  def tokenCountRe(text: Column): Column = regexp_count(text, lit("[a-z0-9]+"))

  private val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Count of English stopword occurrences (word-bounded). */
  def stopwordHits(text: Column): Column = stopwordHits(text, StopwordsEn)

  def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit("\\b(" + words.mkString("|") + ")\\b"))

  /** Punctuation character count. */
  def punctHits(text: Column): Column = regexp_count(text, lit("[.,!?;:]"))

  /** Composite quality score: length saturation + stopword density -
    * punctuation density (the standard C4/Gopher-style heuristics):
    *
    *   0.5·min(nChars,400)/400 + 0.3·stop/toks + 0.2·(1 - punct/toks)
    *
    * Evaluated as ONE exact-integer numerator over one denominator
    * with a single IEEE division:
    *
    *   ((25·min(nChars,400) + 4000)·toks + 6000·stop - 4000·punct)
    *     / (20000·toks)
    *
    * — algebraically identical to the sum-of-terms form, but every
    * intermediate is an exact int64 (< 2^53 for any feasible doc), so
    * BOTH engines perform the identical correctly-rounded division
    * and the result is bit-equal with no rounding step at all. The
    * previous formulation (three double terms, round to 4dp) was
    * tie-broken differently by Spark (BigDecimal HALF_UP) and DuckDB
    * (scaled float round) for values within half an ulp of a .00005
    * boundary — ties that first appear around sf0.1.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = tokenCountWs(text).cast("long")
    val num = (lit(25L) * least(nChars.cast("long"), lit(400L)) + lit(4000L)) * toks +
      lit(6000L) * stopwordHits(text).cast("long") -
      lit(4000L) * punctHits(text).cast("long")
    num.cast("double") / (lit(20000.0) * toks)
  }

  /** Per-language stopword lists for the langid heuristic. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "les", "et", "une"),
    "de" -> Seq("der", "die", "und", "das")
  )

  /** Language ID: argmax of per-language stopword hits, ties broken by
    * list order above; "und" (undetermined) when no list scores > 0.
    * The classic fastText-free heuristic — cheap enough to run inline
    * over 100 TB of text.
    */
  def langId(text: Column): Column = {
    val hits = LangStopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val best = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((lang, h), els) =>
      when(h > 0 && h === best, lit(lang)).otherwise(els)
    }
  }

  /** Karp-Rabin polynomial rolling hash of the first `prefixLen` chars:
    * fold(acc * 31 + codepoint) mod 1e9+7. Same fold is expressible in
    * DuckDB (`list_reduce`) for the oracle. Requires non-empty text.
    */
  def fingerprint(textCol: String, prefixLen: Int = 64): Column =
    expr(
      s"aggregate(sequence(1, least(length($textCol), $prefixLen)), 0L, " +
        s"(acc, i) -> (acc * 31 + ascii(substr($textCol, i, 1))) % 1000000007)"
    )

  /** PII patterns for redaction. Lowercase classes suffice for the
    * synthesized corpus; a production list adds unicode classes and
    * more ids (IPs, IBANs, …) — the machinery is the same regex chain.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** Redact PII in place: emails then phones, global replacement. A
    * scalar projection — redaction over 100 TB is scan-bound, no
    * shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** URL canonicalization: lowercase, strip the query string, strip
    * trailing slashes — the normalize step before URL-keyed dedup.
    */
  def urlCanonical(url: Column): Column =
    regexp_replace(regexp_replace(lower(url), "\\?.*$", ""), "/+$", "")

  /** Character shingles (overlapping n-grams) of `text` as an array —
    * the unit of Jaccard/MinHash dedup. transform over a sequence keeps
    * it codegen-friendly; shingle count is length-n+1 per doc.
    */
  def charShingles(textCol: String, n: Int): Column =
    expr(s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substr($textCol, i, $n))")

  /** Word shingles: n-grams of whitespace tokens, space-joined. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), WsRun)
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n)))
    )
  }
}
