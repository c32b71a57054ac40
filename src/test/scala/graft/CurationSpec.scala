package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Pins the cluster-representative rule of [[Curation.curateCorpus]]: the
  * representative is the min id among the members that PASS the quality and
  * language filters — a junk min-id twin must not vanish its whole cluster.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and then it runs back to " +
      "the farm where all of the other animals are waiting for it to return " +
      "with a story about the long day that is now finally over and done"

  test("a surviving member represents the cluster when the min-id member is filtered out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "!!! ??? ### $$$ %%%"), // junk: short, punct-heavy — fails quality
      (2L, goodText),              // near-dup twin of 1 per the injected pair
      (3L, goodText + " indeed")   // independent good doc
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val kept = Curation.curateCorpus(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(2L, 3L)),
      s"expected cluster {1,2} to be represented by surviving doc 2; got ${kept.mkString(",")}")
  }

  test("among several surviving near-dups only the min id is kept") {
    import spark.implicits._
    val docs = Seq(
      (10L, goodText), (11L, goodText), (12L, goodText), (20L, "@@@ !!!")
    ).toDF("doc_id", "text")
    val pairs = Seq((10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val kept = Curation.curateCorpus(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(10L)),
      s"expected only min surviving id 10; got ${kept.mkString(",")}")
  }

  test("budgetSelect: equal-quality docs admit in id order until the budget is spent") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"tok$i").mkString(" ") // identical text → identical quality
    val docs = (1L to 5L).map(i => (s"s", i, ten)).toDF("source", "doc_id", "text")
    val sel = Curation.budgetSelect(docs, budgetTokens = 35L)
      .orderBy("doc_id").collect()
    assert(sel.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(sel.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(10L, 20L, 30L))
  }

  test("budgetSelect: a higher-quality doc preempts a lower-quality smaller id") {
    import spark.implicits._
    val docs = Seq(
      ("s", 1L, "zz zz! zz?"),  // punct-heavy, short → low quality
      ("s", 2L, goodText))      // high quality, 42 tokens
    .toDF("source", "doc_id", "text")
    val nGood = goodText.split("\\s+").length.toLong
    val sel = Curation.budgetSelect(docs, budgetTokens = nGood).collect()
    assert(sel.map(_.getLong(1)).toSeq == Seq(2L),
      "only the high-quality doc fits; the low-quality doc 1 must not claim the budget first")
  }

  test("budgetSelectBinned ⊆ budgetSelect and stays within budget (the scale-route law)") {
    val docs = Tables.documents(spark, SfDir)
    val budget = 60L
    val exact = Curation.budgetSelect(docs, budget)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val binned = Curation.budgetSelectBinned(docs, budget).collect()
    assert(binned.nonEmpty, "fixture budget must select something")
    val binnedKeys = binned.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(binnedKeys.subsetOf(exact),
      s"binned kept ${binnedKeys.diff(exact)} outside the exact greedy prefix")
    binned.groupBy(_.getString(0)).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum <= budget)
    }
  }
}
