package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wau

class WauSpec extends AnyFunSuite {
  import SparkTestSession._

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
