package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("point-in-interval equals the naive range join at any bin width") {
    val rnd = new scala.util.Random(11)
    val points = (1L to 80L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "p")
    val ivs = (1L to 25L).map { i =>
      val s = rnd.nextInt(950).toLong
      (i, s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "lo", "hi")
    val naive = points.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // binning is a pure execution strategy — results invariant in binWidth
    Seq(7L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"binWidth=$w diverged from naive")
    }
  }

  test("binned plan is an equi-join; the naive predicate is a nested loop") {
    val points = Seq((1L, 10L)).toDF("pid", "p")
    val ivs = Seq((1L, 5L, 15L)).toDF("iid", "lo", "hi")
    val binned = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 60L)
      .queryExecution.executedPlan.toString
    assert(!binned.contains("BroadcastNestedLoopJoin") && !binned.contains("CartesianProduct"),
      s"binned range join must be an equi-join:\n$binned")
    val naive = points.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"),
      "baseline expectation drifted: Spark now plans bare range joins differently")
  }

  test("per-key variant only matches intervals of the same key") {
    val points = Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("pid", "p", "k")
    val ivs = Seq((1L, 5L, 15L, "a")).toDF("iid", "lo", "hi", "k")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 60L, key = Some("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L)))
  }
}
