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
