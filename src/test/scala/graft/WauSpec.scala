package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wau

class WauSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sketch-merge rollup: day-sketch union tracks exact WAU; matches a direct week sketch") {
    val ev = Tables.events(spark, SfDir)
    val exact = Wau.wau(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rolled = Wau.wauSketchRollup(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rolled.keySet == exact.keySet)
    exact.foreach { case (week, n) =>
      assert(math.abs(rolled(week) - n) <= math.max(1L, (n * 0.05).toLong),
        s"week $week: rolled-up estimate ${rolled(week)} vs exact $n")
    }
    // merge correctness, not just accuracy: unioning the per-day sketches
    // must equal sketching the whole week directly (associativity of the
    // HLL union — the property that makes the incremental rollup valid)
    val direct = ev
      .select(Wau.week(col("ts")).as("event_week"), col("user_id"))
      .where(col("event_week").between(
        Wau.week(to_timestamp(lit("2024-01-01"))), Wau.week(to_timestamp(lit("2024-01-31")))))
      .groupBy(col("event_week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rolled == direct, "day-split sketch union diverged from the direct week sketch")
  }

  test("wauValidated: boolean is TRUE for the real sketch and FLIPS on a drifted estimate") {
    // The self-validation harness must be falsifiable, or the oracle's
    // `TRUE AS within_tol` proves nothing: feed it a deliberately-off
    // estimate column and require the boolean to go false.
    val ev = Tables.events(spark, SfDir)
    val good = Wau.wauValidated(
      Wau.wauApprox(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31"),
      "wau_approx", ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .collect()
    assert(good.nonEmpty && good.forall(_.getAs[Boolean]("within_tol")),
      "real HLL++ estimate must sit within the 5% gate")
    val drifted = Wau.wauApprox(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .withColumn("wau_approx", col("wau_approx") * 2)
    val bad = Wau.wauValidated(
      drifted, "wau_approx", ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .collect()
    assert(bad.nonEmpty && bad.forall(!_.getAs[Boolean]("within_tol")),
      "a 2x-off estimate must flip the tolerance boolean (and thus the oracle hash)")
  }

  test("approx WAU tracks exact WAU within the sketch's error bound") {
    val ev = Tables.events(spark, SfDir)
    val exact = Wau.wau(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val approx = Wau.wauApprox(ev, "user_id", col("ts"), "2024-01-01", "2024-01-31", rsd = 0.01)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (week, n) =>
      val a = approx(week)
      // rsd 0.01 → generous 5% acceptance band (HLL++ error is probabilistic)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"week $week: approx $a vs exact $n")
    }
  }
}
