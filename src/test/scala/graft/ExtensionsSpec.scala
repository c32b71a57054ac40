package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions deployment path: a session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (SparkTestSession
  * sets it) must expose every kernel to plain SQL with no library call.
  */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("kernels are available to SQL via spark.sql.extensions injection") {
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  size(graft_shingles(array('a','b','c','d'), 3)) AS ns,
        |  size(graft_minhash(array('a b c'))) AS nm,
        |  graft_simhash60(cast(array() AS array<string>)) AS sh,
        |  size(graft_winnow(array('a','b','c','d','e','f','g'), 3, 4)) AS nw,
        |  graft_repstats(array('a','b','a','b','a'), 2) AS rs
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(1) == 2)   // grams: "a b c", "b c d"
    assert(r.getInt(2) == 32)  // 32 minhash slots
    assert(r.getLong(3) == 0L) // empty token set → zero signature
    assert(r.getInt(4) >= 1)   // 5 grams, window 4 → >= 1 fingerprint
    val rs = r.getStruct(5)    // grams: a b, b a, a b, b a → top "a b" ×2
    assert(rs.getLong(0) == 4L && rs.getLong(1) == 2L && rs.getLong(2) == 2L)
  }

  test("graft_bpe_apply is injected: SQL segmentation under a merge-table literal") {
    val r = spark.sql(
      """SELECT graft_bpe_apply('lllow', array('l','o', 'lo','w')) AS s,
        |       graft_bpe_apply('ab', cast(array() AS array<string>)) AS raw
        |""".stripMargin).head()
    // chars l,l,l,o,w → merge (l,o): l,l,lo,w → merge (lo,w): l,l,low
    assert(r.getSeq[String](0).toList == List("l", "l", "low"))
    assert(r.getSeq[String](1).toList == List("a", "b")) // empty table = chars
  }

  test("the vec_sum aggregate is injected too") {
    val s = spark.sql(
      """SELECT graft_vec_sum(v) AS s
        |FROM VALUES (array(1.0d, 2.0d)), (array(3.0d, 4.0d)) AS t(v)""".stripMargin)
      .head().getAs[collection.Seq[Double]](0)
    assert(s == Seq(4.0, 6.0))
  }

  test("the vec_min / vec_max aggregates are injected too") {
    val r = spark.sql(
      """SELECT graft_vec_min(v) AS mn, graft_vec_max(v) AS mx
        |FROM VALUES (array(1.0d, 4.0d)), (array(3.0d, 2.0d)) AS t(v)""".stripMargin)
      .head()
    assert(r.getAs[collection.Seq[Double]](0) == Seq(1.0, 2.0))
    assert(r.getAs[collection.Seq[Double]](1) == Seq(3.0, 4.0))
  }
}
