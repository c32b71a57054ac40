package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Histograms

class HistogramsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Lo = 0.0
  private val Hi = 500.0
  private val Bins = 50

  test("mergeability: day-split rollup equals the direct weekly histogram") {
    // the property that makes the incremental rollup valid — same law the
    // WAU sketch rollup pins for HLL unions, here with exact integers
    val ev = Tables.events(spark, SfDir).where(col("value").isNotNull)
    val rolled = Histograms.weeklyRollup(
      Histograms.dailyHistogram(ev, col("value"), col("ts"), "2024-01-01", "2024-01-31", Lo, Hi, Bins))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val direct = ev.select(
      graft.operators.Wau.week(col("ts")).as("w"),
      Histograms.bin(col("value"), Lo, Hi, Bins).as("bin"))
      .where(col("w").between(
        graft.operators.Wau.week(to_timestamp(lit("2024-01-01"))),
        graft.operators.Wau.week(to_timestamp(lit("2024-01-31")))))
      .groupBy("w", "bin").count()
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(rolled == direct)
    assert(rolled.nonEmpty)
  }

  test("percentile bounds: minimal bin covering ceil(q*total), true quantile under the edge") {
    val ev = Tables.events(spark, SfDir).where(col("value").isNotNull)
    val got = Histograms.weeklyValuePercentiles(
      ev, col("value"), col("ts"), "2024-01-01", "2024-01-31", Lo, Hi, Bins, Seq(0.5, 0.9, 0.99))
      .collect()
    assert(got.nonEmpty)
    // exact per-week sorted values for the ground-truth check
    val byWeek = ev.select(graft.operators.Wau.week(col("ts")).as("w"), col("value"))
      .collect().groupBy(_.getDate(0).toString)
      .map { case (w, rs) => w -> rs.map(_.getDouble(1)).sorted }
    got.foreach { r =>
      val (w, q, bin, edge) =
        (r.getDate(0).toString, r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(edge == Lo + (bin + 1) * (Hi - Lo) / Bins)
      val vals = byWeek(w)
      val rank = math.ceil(q * vals.length).toInt
      val trueQuantile = vals(rank - 1)
      // the histogram's guarantee: the true q-quantile lies in or below the
      // reported bin — i.e. strictly under the upper edge, and (minimality)
      // above the PREVIOUS bin's upper edge minus one bin width only if the
      // bin is the first covering one
      assert(trueQuantile < edge + 1e-9, s"$w q=$q: true $trueQuantile above bound $edge")
      val prevEdge = Lo + bin * (Hi - Lo) / Bins
      val below = vals.count(_ < prevEdge - 1e-9)
      assert(below < rank, s"$w q=$q: bin $bin not minimal (prev edge already covers rank $rank)")
    }
  }

  test("clamping: out-of-range values land in the edge bins, not outside [0, nBins)") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 499.999, 500.0, 1e9).toDF("v")
      .select(Histograms.bin(col("v"), Lo, Hi, Bins).as("bin"))
    val bins = df.collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(0L, 0L, 49L, 49L, 49L))
  }
}
