package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

class LanguageModelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("target-like text scores lower avg_nll than out-of-vocabulary text") {
    import spark.implicits._
    val target = Seq((1L, "the cat sat on the mat"), (2L, "the cat sat on the rug"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, "the cat sat on the mat"), // every bigram in-model
      (11L, "zyx qwv plk mno abc def") // every token OOV
    ).toDF("doc_id", "text")
    val got = LanguageModel.perplexity(docs, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(10L) < got(11L))
  }

  test("docs with fewer than two tokens are not scored; n_bigrams = tokens - 1") {
    import spark.implicits._
    val target = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (20L, "solo"), (21L, ""), (22L, "a b c"), (23L, "a b c d e")
    ).toDF("doc_id", "text")
    val got = LanguageModel.perplexity(docs, target).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(22L, 23L))
    assert(got(22L) == 2L && got(23L) == 4L)
  }

  test("empty-vocabulary target is rejected, not silently scored as all-OOV") {
    import spark.implicits._
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.perplexity(docs, empty)
    }
    assert(e.getMessage.contains("empty vocabulary"))
  }

  test("fixture: below-mean selection is falsifiable and log_prob is negative") {
    val docs = Tables.documents(spark, SfDir)
    val target = docs.where(col("doc_id") % 3 === 0)
    val rows = LanguageModel.perplexity(docs, target)
      .select(col("log_prob"), col("selected")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(0) < 0.0))
    // a corpus-relative cut must split the corpus, not rubber-stamp it —
    // the degenerate-constant-boolean class the absolute cut produced
    assert(rows.exists(_.getBoolean(1)) && rows.exists(!_.getBoolean(1)))
  }

  test("scores are repartition-invariant (quantization absorbs sum order)") {
    val docs = Tables.documents(spark, SfDir).limit(200)
    val target = docs.where(col("doc_id") % 2 === 0)
    def score(d: org.apache.spark.sql.DataFrame) =
      LanguageModel.perplexity(d, target).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(score(docs) == score(docs.repartition(13)))
  }
}
