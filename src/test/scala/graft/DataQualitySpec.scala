package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def dirty = {
    import spark.implicits._
    Seq(
      (Some(1L), Some("O"), 10.0),
      (Some(2L), Some("F"), -5.0), // bad price
      (Some(2L), Some("X"), 20.0), // dup key, bad status
      (None, Some("O"), 30.0), // null key
      (Some(4L), None, 40.0)) // null status (domain check must count it)
      .toDF("k", "status", "price")
  }

  test("violation counts are row-exact and pass only at zero") {
    val got = DataQuality.run(dirty, Seq(
      expectZero("k_complete", col("k").isNull),
      expectUniqueKey("k_unique", col("k")),
      expectZero("status_domain", !col("status").isin("O", "F")),
      expectZero("price_positive", col("price") <= 0.0),
      Check("rows_min", count(lit(1)), _ >= 3.0)))
      .collect()
      .map(r => r.getString(1) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got("k_complete") == ((1.0, false)))
    // 5 rows, 3 distinct non-null keys → 2 violations (the dup copy + the null)
    assert(got("k_unique") == ((2.0, false)))
    // NULL status: `!isin` is NULL, not TRUE — the when() counts it as 0.
    // Domain checks that must reject NULLs say so explicitly (isNull ||):
    assert(got("status_domain") == ((1.0, false)))
    assert(got("price_positive") == ((1.0, false)))
    assert(got("rows_min") == ((5.0, true)))
  }

  test("the whole suite is ONE aggregate pass over ONE scan") {
    val df = Tables.orders(spark, SfDir)
    val suite = DataQuality.run(df, Seq(
      expectZero("c1", col("o_custkey").isNull),
      expectUniqueKey("c2", col("o_orderkey")),
      expectZero("c3", col("o_totalprice") <= 0.0),
      Check("c4", count(lit(1)), _ >= 1.0)))
    val plan = suite.queryExecution.executedPlan.toString
    // one parquet scan feeds everything — N checks must not mean N scans
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
    val rows = suite.collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("c1", "c2", "c3", "c4"))
    assert(rows.forall(_.getBoolean(3)))
  }

  test("check_rank preserves declaration order; duplicate names rejected") {
    val rows = DataQuality.run(dirty, Seq(
      expectZero("zzz", col("k").isNull),
      expectZero("aaa", col("price") <= 0.0)))
      .orderBy(col("check_rank")).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("zzz", "aaa"))
    intercept[IllegalArgumentException] {
      DataQuality.run(dirty, Seq(
        expectZero("dup", col("k").isNull),
        expectZero("dup", col("price") <= 0.0)))
    }
    intercept[IllegalArgumentException](DataQuality.run(dirty, Nil))
  }

  test("profile: exact per-column stats from one pass; approxOnly serves sketches") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "s")
    val got = DataQuality.profile(df, Seq("k" -> col("k"), "s" -> col("s")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getBoolean(6)))
    assert(got.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2", true),
      ("s", 4L, 1L, 2L, "a", "b", true)))
    // approxOnly: no exact branch, cardinality comes from the sketch alone
    val ao = DataQuality.profile(df, Seq("k" -> col("k")), approxOnly = true).head()
    assert(ao.getLong(3) == 2L) // HLL is exact at this cardinality
    assert(ao.getBoolean(6))
  }
}
