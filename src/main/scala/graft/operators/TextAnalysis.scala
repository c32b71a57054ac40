package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, and document fingerprinting.
  *
  * Everything here is a pure column expression (whole-stage-codegen'd, no
  * UDFs), so at 100 TB these run as a single map-side pass over the corpus —
  * no shuffle at all until an aggregation asks for one.
  */
object TextAnalysis {

  /** Canonical form for fingerprinting/dedup: lowercase, collapse runs of
    * whitespace, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish lexer token count: alpha runs, digit runs, and single
    * non-alphanumeric marks (the common pre-tokenizer shape).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation-to-character ratio (quality signal). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") / length(text)

  /** Fraction of tokens that are stopwords (quality signal). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  /** Variant over a pre-computed token-array column — lets a query tokenize
    * ONCE and feed every downstream metric (r1 re-ran the regex+split chain
    * per metric; Catalyst's CollapseProject keeps a separately-projected
    * token column materialized because it is non-cheap and multiply-used).
    */
  def stopwordRatioOf(toks: Column): Column = {
    val stops = filter(toks, t => t.isin(Stopwords.map(lit(_)): _*))
    size(stops).cast("double") / size(toks)
  }
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  /** Mean token length over whitespace tokens. */
  def avgTokenLenOf(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("double")), lit(0.0), _ + _) / size(toks)
  def avgTokenLen(text: Column): Column = avgTokenLenOf(tokens(text))

  /** Composite quality score in [0,1]: long-enough docs with moderate
    * stopword presence and little punctuation score high. Deterministic,
    * SQL-expressible (mirrored in the DuckDB oracle).
    */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val stopScore = least(stopwordRatioOf(toks) * lit(4.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    (lenScore * lit(0.4) + stopScore * lit(0.3) + punctPenalty * lit(0.3))
  }
  def qualityScore(text: Column): Column = qualityScoreOf(text, tokens(text))

  /** Marker-word language-ID heuristic: count hits from a tiny per-language
    * marker list over the token set; argmax with a fixed priority tie-break.
    * (N-gram frequency profiles are the production version; the marker scan
    * is the same map-side shape at scale.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "las"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScoreOf(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOf(tokens(text), markers)

  /** Marker argmax over a pre-computed token column — one tokenization pass
    * regardless of language count (the r1 plan re-tokenized per language).
    */
  def langIdOf(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScoreOf(toks, ms) }
    // argmax, ties resolved by list order (en first), zero hits → "und"
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  def langId(text: Column): Column = langIdOf(tokens(text))

  /** Document fingerprint: md5 of the normalized text — identical across
    * engines, the key for exact dedup.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))
}
