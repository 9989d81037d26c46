package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis primitives for the training-data pipeline (SURVEY.md
  * §2 C8-C10) as pure built-in Column expressions — every one of these
  * stays inside whole-stage codegen; nothing leaves the executor.
  *
  * The regex patterns are mirrored verbatim in the DuckDB oracles, so
  * they deliberately use the RE2 ∩ java.util.regex common subset
  * (no lookarounds, no backrefs).
  */
object TextFunctions {

  /** Whitespace tokens ("" -> 0 tokens). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish pre-tokenizer: letter runs | single digits | single
    * non-alnum marks. The unit count an LLM tokenizer budget would be
    * proportional to.
    */
  val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  def alphaCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Za-z]", ""))).cast("long")

  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"-]", ""))).cast("long")

  def whitespaceCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\s", ""))).cast("long")

  /** Per-language stopword lists for the n-gram-heuristic language ID.
    * Ordered — the argmax tie-break follows this order.
    */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the|a|of|and|is|to|in|that|it|for",
    "de" -> "der|die|das|und|ist|nicht|ein|zu|mit|den",
    "fr" -> "le|la|les|et|est|un|une|des|du|que",
    "es" -> "el|los|las|y|es|un|una|de|en|por")

  def stopwordHits(text: Column, words: String): Column =
    size(regexp_extract_all(lower(text), lit(s"\\b($words)\\b"), lit(0))).cast("long")

  /** Argmax language with first-listed-wins tie-break, as a CASE chain
    * so Spark and the SQL oracle share the exact decision structure.
    */
  def langPredict(scores: Seq[(String, Column)]): Column = {
    def pick(rest: Seq[(String, Column)]): Column = rest match {
      case Seq((lang, _)) => lit(lang)
      case (lang, s) +: tail =>
        when(tail.map(_._2).map(s >= _).reduce(_ && _), lit(lang))
          .otherwise(pick(tail))
    }
    pick(scores)
  }

  /** Composite quality score in [0,1]: alphabetic density, token length
    * sanity, stopword presence. Fixed-structure double arithmetic —
    * bit-deterministic given the same integer counts.
    */
  def qualityScore(alphaRatio: Column, avgTokenLen: Column, stopRatio: Column): Column =
    lit(0.4) * alphaRatio +
      lit(0.3) * least(lit(1.0), avgTokenLen / lit(8.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * lit(5.0))

  def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(0.0)).otherwise(num.cast(DoubleType) / den)

  /** let-binding for Column expressions: evaluate `x` ONCE per row and
    * reference the bound value freely in `body`. Encoded as a
    * single-element `transform`, whose array argument is evaluated
    * once and whose lambda variable is a plain bound reference — no
    * optimizer rule re-inlines across a lambda binding.
    *
    * Why it exists (round-10 finding): an expression tree referenced
    * INSIDE a HOF lambda (e.g. `element_at(split(text), i)` in a
    * transform-over-sequence) re-evaluates per ELEMENT, not per row —
    * tokenizing a 100-token doc 200× turned the bigram ops
    * quadratic in doc length. Staging through a Project column only
    * helps while CollapseProject's cheapness heuristic declines to
    * inline it back; this binding is immune by construction.
    */
  def letCol(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), v => body(v)), 1)
}
