package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Materialize

class MaterializeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    ("a", 1L, 10L), ("a", 2L, 5L), ("b", 3L, 7L),
    ("a", 4L, 2L), ("b", 5L, 9L), ("c", 6L, 6L))

  private def summarize(df: DataFrame): DataFrame = df
    .groupBy(col("k"))
    .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))

  private def collectMap(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))).toMap

  test("mergeSummaries of any batching equals the direct aggregate") {
    val all = rows.toDF("k", "id", "v")
    val expect = collectMap(summarize(all))
    // three different batchings of the same rows
    val batchings = Seq(
      Seq(rows.take(2), rows.drop(2)),
      Seq(rows.take(4), rows.drop(4)),
      rows.grouped(1).toSeq)
    for (parts <- batchings) {
      val merged = Materialize.mergeSummaries(
        parts.map(_.toDF("k", "id", "v")).map(summarize),
        Seq("k"), sumCols = Seq("n"), minCols = Seq("lo"), maxCols = Seq("hi"))
      assert(collectMap(merged) == expect, s"batching of sizes ${parts.map(_.size)}")
    }
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c))") {
    val Seq(a, b, c) =
      Seq(rows.take(2), rows.slice(2, 4), rows.drop(4))
        .map(_.toDF("k", "id", "v")).map(summarize)
    def m(parts: DataFrame*): DataFrame = Materialize.mergeSummaries(
      parts, Seq("k"), sumCols = Seq("n"), minCols = Seq("lo"), maxCols = Seq("hi"))
    assert(collectMap(m(m(a, b), c)) == collectMap(m(a, m(b, c))))
  }

  test("applyRetractions == recompute; zero-count groups vanish; underflow fails loudly") {
    val base = Seq(("a", 10L), ("a", 5L), ("b", 7L), ("c", 6L)).toDF("k", "v")
    val inserts = Seq(("a", 2L), ("d", 9L)).toDF("k", "v")
    // retract ALL of c (its group must vanish) and one a-row
    val deletes = Seq(("c", 6L), ("a", 5L)).toDF("k", "v")
    val summary0 = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("v"))
    val got = Materialize.applyRetractions(
      summary0, inserts, deletes, Seq("k"), "n", Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Long]("v")))).toMap
    assert(got == Map("a" -> ((2L, 12L)), "b" -> ((1L, 7L)), "d" -> ((1L, 9L))),
      s"maintained state diverged: $got")
    // underflow: retracting a row never inserted must FAIL, not go negative
    val bad = Seq(("b", 7L), ("b", 7L)).toDF("k", "v")
    val e = intercept[Exception] {
      Materialize.applyRetractions(
        summary0, inserts.limit(0), bad, Seq("k"), "n", Seq("v")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("underflowed")))
  }

  test("empty parts and missing agg columns are rejected loudly") {
    val s = summarize(rows.toDF("k", "id", "v"))
    intercept[IllegalArgumentException](Materialize.mergeSummaries(Nil, Seq("k"), Seq("n")))
    intercept[IllegalArgumentException](Materialize.mergeSummaries(Seq(s), Seq("k"), Nil))
  }

  test("joinDelta: base-join ∪ delta rows == full recompute, multiplicities included") {
    val aOld = Seq((1L, "a1"), (2L, "a2"), (2L, "a2b")).toDF("k", "av")
    val dA = Seq((1L, "a3"), (3L, "a4")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (3L, "b2")).toDF("k", "bv")
    val dB = Seq((2L, "b3"), (1L, "b4"), (9L, "b5")).toDF("k", "bv")
    val mv = aOld.join(bOld, Seq("k"))
      .unionByName(Materialize.joinDelta(aOld, dA, bOld, dB, Seq("k")))
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
    assert(mv.exceptAll(full).count() == 0 && full.exceptAll(mv).count() == 0)
    // exact multiset: key 1 has 2 left x 2 right = 4 rows
    assert(mv.where(col("k") === 1L).count() == 4L)
    // unmatched delta key 9 contributes nothing
    assert(mv.where(col("k") === 9L).count() == 0L)
  }

  test("joinDelta rejects colliding non-key columns loudly") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "v")
    val ex = intercept[IllegalArgumentException](
      Materialize.joinDelta(a, a, b, b, Seq("k")))
    assert(ex.getMessage.contains("collide"))
  }
}
