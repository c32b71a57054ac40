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
