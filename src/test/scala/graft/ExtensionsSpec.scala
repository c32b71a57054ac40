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

  test("graft_sqdist_l / graft_eq_count match their interpreted HOF chains") {
    // the pair kernels the KNN-Shapley and LSH-verify hot paths swapped to:
    // same value as the aggregate(zip_with(...)) / size(filter(zip_with(...)))
    // chains they replaced, null arrays null out, ragged lengths throw
    val r = spark.sql(
      """SELECT
        |  graft_sqdist_l(array(1L, 5L, 2L), array(4L, 5L, 0L)) AS d,
        |  aggregate(zip_with(array(1L, 5L, 2L), array(4L, 5L, 0L),
        |            (x, y) -> (x - y) * (x - y)), 0L, (a, x) -> a + x) AS d_hof,
        |  graft_eq_count(array(1L, 5L, 2L), array(4L, 5L, 2L)) AS c,
        |  size(filter(zip_with(array(1L, 5L, 2L), array(4L, 5L, 2L),
        |              (x, y) -> x = y), b -> b)) AS c_hof,
        |  graft_sqdist_l(cast(null AS array<bigint>), array(1L)) AS dn,
        |  graft_eq_count(array(1L), cast(null AS array<bigint>)) AS cn
        |""".stripMargin).head()
    assert(r.getLong(0) == 13L && r.getLong(1) == 13L)
    assert(r.getInt(2) == 2 && r.getInt(3) == 2)
    assert(r.isNullAt(4) && r.isNullAt(5))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sqdist_l(array(1L), array(1L, 2L))").head()
    }
    assert(e.getMessage.contains("mismatched") ||
      Option(e.getCause).exists(_.getMessage.contains("mismatched")))
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

  test("media fingerprint kernels and text utilities are injected") {
    val r = spark.sql(
      """SELECT
        |  graft_media_header(cast('not media' AS BINARY)).format AS fmt,
        |  graft_ppm_dhash(cast('not a ppm' AS BINARY)) AS ph,
        |  graft_wav_ehash(cast('not a wav' AS BINARY)) AS ah,
        |  graft_nfc('é') AS nfc,
        |  size(graft_gram_hashes(array('a','b','c','d'), 3)) AS ng
        |""".stripMargin).head()
    assert(r.getString(0) == "unknown")
    assert(r.isNullAt(1) && r.isNullAt(2)) // classify, never throw
    assert(r.getString(3) == "é")     // composed NFC form
    assert(r.getInt(4) == 2)
  }

  test("sketch aggregates (theta, kll, bloom) are injected") {
    val r = spark.sql(
      """SELECT
        |  graft_theta_estimate(graft_theta_sketch(v, 12)) AS est,
        |  graft_kll_quantile(graft_kll_sketch(cast(v AS DOUBLE), 200), 0.5d) AS med
        |FROM VALUES (1L), (2L), (3L) AS t(v)""".stripMargin).head()
    assert(r.getDouble(0) == 3.0) // exact mode: estimate IS the count
    assert(r.getDouble(1) >= 1.0 && r.getDouble(1) <= 3.0)
    // might_contain requires the filter as a constant/scalar subquery
    val hit = spark.sql(
      """SELECT graft_bloom_contains(
        |  (SELECT graft_bloom_agg(xxhash64(v), 3L, 1024L) FROM VALUES (1L), (2L), (3L) AS t(v)),
        |  xxhash64(2L)) AS hit""".stripMargin).head().getBoolean(0)
    assert(hit) // no false negatives
  }

  test("exact bitmap aggregates are injected") {
    val r = spark.sql(
      """SELECT
        |  graft_bitmap_count(graft_bitmap_agg(v)) AS n,
        |  graft_bitmap_and_count(
        |    (SELECT graft_bitmap_agg(x) FROM VALUES (1L), (2L) AS a(x)),
        |    (SELECT graft_bitmap_agg(y) FROM VALUES (2L), (3L) AS b(y))) AS inter,
        |  graft_bitmap_andnot_count(
        |    (SELECT graft_bitmap_agg(x) FROM VALUES (1L), (2L) AS a(x)),
        |    (SELECT graft_bitmap_agg(y) FROM VALUES (2L), (3L) AS b(y))) AS anotb
        |FROM VALUES (1L), (2L), (2L), (5L) AS t(v)""".stripMargin).head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 1L)
    val u = spark.sql(
      """SELECT graft_bitmap_count(graft_bitmap_union(bm)) FROM (
        |  SELECT graft_bitmap_agg(v) AS bm FROM VALUES (1L, 1L), (1L, 2L), (2L, 2L), (2L, 9L) AS t(g, v)
        |  GROUP BY g)""".stripMargin).head().getLong(0)
    assert(u == 3L)
  }
}
