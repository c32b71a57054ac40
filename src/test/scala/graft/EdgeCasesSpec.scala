package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Degenerate-document semantics across the text operators: a 100 TB crawl
  * contains empty strings, whitespace-only docs, single tokens, and NULL
  * text, and every operator must either drop such docs or emit a defined
  * value — never crash, never emit a phantom (the chunkDocs empty-doc bug
  * this suite generalizes from). Expectations are pinned, not just
  * "no exception": silent semantic drift on edge rows is the failure mode.
  */
class EdgeCasesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // one row per degenerate shape, plus a healthy control doc
  private def corpus: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then some more words"),
    (2L, ""),
    (3L, "   "),
    (4L, "solo"),
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("chunking, shingles, winnow, repetition: degenerate docs drop, control survives") {
    // "solo" is a legitimate 1-token doc: it chunks (one 1-token chunk) but
    // has no 3-grams, so the gram-based operators drop it
    assert(TextAnalysis.chunkDocs(corpus).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // shingles: < n tokens → no grams → dropped (incl. [""] token arrays)
    assert(Dedup.shingles(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(Dedup.winnowFingerprints(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // repetition: docs with < n tokens have no grams and drop; "" tokenizes
    // to [""] (1 token < 3) so it drops too; NULL text → kernel null → drop
    assert(TextAnalysis.repetitionScores(corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("bpe pairs, budget selection, containment, incremental report, mixture weights: degenerate docs handled") {
    import graft.operators.{Curation, Sampling}
    // bpe: only docs with >= 2-char tokens contribute ("" / "   " tokenize
    // to [""], NULL drops); conservation over the surviving tokens
    val pairsTotal = TextAnalysis.bpePairCounts(corpus, topK = 1000)
      .agg(sum(col("n"))).head().getLong(0)
    val expectedPairs = corpus
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .where(length(col("t")) >= 2)
      .agg(sum(length(col("t")) - 1)).head().getLong(0)
    assert(pairsTotal == expectedPairs && pairsTotal > 0)

    // budget selection: empty/whitespace/NULL docs are excluded before any
    // quality math (their ratios are 0/0); solo and the control survive
    val sel = Curation.budgetSelect(corpus.withColumn("source", lit("s")), budgetTokens = 1000L)
      .collect()
    assert(sel.map(_.getLong(1)).toSet == Set(1L, 4L))
    assert(sel.forall(r => !r.getAs[Double]("quality").isNaN))

    // containment: a single doc with grams cannot pair
    assert(Dedup.containmentPairs(corpus).collect().isEmpty)

    // incremental report: every fresh doc gets a verdict row — gramless
    // (empty/solo/NULL) docs are admitted with 0 matches, never dropped
    val rep = Dedup.incrementalDedupReport(corpus.where(lit(false)), corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(rep.values.forall(_ == 0L))

    // mixture weights: NULL token counts skip the sum but the doc still
    // counts; the propensity stays a defined non-negative integer
    val mw = Sampling.mixtureWeights(corpus.withColumn("source", lit("s"))).collect()
    assert(mw.length == 1 && mw.head.getLong(1) == 5L && mw.head.getLong(3) >= 0L)
  }

  test("duplicated spans: degenerate docs drop; only genuinely duplicated runs span") {
    // nothing repeats in the base corpus: no spans at all
    assert(Dedup.duplicatedSpans(corpus, l = 4, minOcc = 2).isEmpty)
    // doubling the corpus duplicates doc 1's whole run; ""/"   "/"solo"/NULL
    // still have < l tokens (or null-drop in the kernel) and stay out
    val doubled = corpus.unionByName(corpus.withColumn("doc_id", col("doc_id") + 100))
    val spanned = Dedup.duplicatedSpans(doubled, l = 4, minOcc = 2)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(spanned == Set(1L, 101L))
  }

  test("lang-ID and fingerprint: defined values on degenerate docs") {
    val langs = corpus.where(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.langIdOf(TextAnalysis.tokens(col("text"))).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(2L) == "und" && langs(3L) == "und" && langs(4L) == "und")
    // fingerprint: whitespace-only normalizes to "" — same print as empty,
    // distinct from any real content
    val fps = corpus.where(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(2L) == fps(3L) && fps(2L) != fps(1L))
  }

  test("exact dedup groups degenerate docs without crashing; NULL text stays out") {
    val groups = Dedup.exactGroups(corpus.where(col("text").isNotNull))
    val byFp = groups.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // "" and "   " share the empty fingerprint → one group of 2
    assert(byFp.values.toSeq.sorted == Seq(1L, 1L, 2L))
  }

  test("minhash/simhash signatures on degenerate docs are defined and equal for equal content") {
    // minhash rides on shingles, so gram-less docs never reach the index
    // (the Long.MaxValue empty-sentinel stays internal, as documented)
    val sigs = Dedup.minhashSignatures(corpus.where(col("text").isNotNull))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.keySet == Set(1L))
    // simhash is token-based: "" and "   " both tokenize to [""] and get
    // the SAME (nonzero) signature — identical degenerate content hashes
    // identically, distinct from real content
    val sh = Dedup.simhash(corpus.where(col("text").isNotNull))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(2L) == sh(3L) && sh(2L) != sh(1L))
  }
}
