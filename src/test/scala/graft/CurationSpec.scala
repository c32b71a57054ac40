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
}
