package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histograms — the quantile analog of [[Wau]]'s
  * day→week HLL sketch-merge rollup, and unlike `approx_percentile` it is
  * EXACTLY replayable cross-engine: the daily sketch is a plain
  * `(group, bin, count)` relation, merging is `sum(count)` (associative,
  * incremental — appending a day touches bin rows, not history), and a
  * percentile is derived from the merged counts with integer cumulative
  * sums. Precision is the bin width — the standard observability/metrics
  * trade (Prometheus histograms make the same one); the bound reported is
  * the bin's UPPER edge, i.e. "p99 ≤ edge".
  *
  * Scale shape: the daily job is one map-side bin projection + a
  * `(day, bin)` aggregation whose shuffle carries at most `nBins` rows per
  * (group, day) — the rollup table a 100 TB pipeline persists. Rollup and
  * percentile extraction never rescan raw events; the window cumsum runs
  * over ≤ `nBins` rows per group.
  *
  * Determinism discipline (cross-engine hash-compare): the bin expression
  * `floor((v − lo) · nBins / (hi − lo))` is written with the SAME operation
  * order as the DuckDB oracle (IEEE ops agree bit-for-bit), counts and
  * cumulative sums are integers, and the rank threshold `ceil(q · total)`
  * is the same double expression both sides — so even where `q · total`
  * rounds, it rounds identically.
  */
object Histograms {

  /** Clamped fixed-width bin id in [0, nBins): values at or beyond the range
    * edges land in the first/last bin (lossy at the tails by design — widen
    * the range, not the code, if the tails matter).
    */
  def bin(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    require(nBins > 0 && hi > lo, s"bad histogram geometry: [$lo, $hi) / $nBins")
    least(
      lit(nBins - 1L),
      greatest(lit(0L), floor((v - lit(lo)) * lit(nBins) / lit(hi - lo)).cast("long")))
  }

  /** The DAILY sketch a rollup pipeline persists: one row per
    * (event_week, event_day, bin) with its event count. Week bounds are
    * inclusive Monday-truncated, like [[Wau.wau]].
    */
  def dailyHistogram(
      df: DataFrame,
      valueCol: Column,
      dateCol: Column,
      startDate: String,
      endDate: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    val loW = Wau.week(to_timestamp(lit(startDate)))
    val hiW = Wau.week(to_timestamp(lit(endDate)))
    df.select(
      Wau.week(dateCol).as("event_week"),
      to_date(dateCol).as("event_day"),
      bin(valueCol, lo, hi, nBins).as("bin"))
      .where(col("event_week").between(loW, hiW))
      .groupBy(col("event_week"), col("event_day"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge daily sketches into weekly ones WITHOUT rescanning raw data —
    * plain integer addition, associative like the HLL union.
    */
  def weeklyRollup(daily: DataFrame): DataFrame =
    daily
      .groupBy(col("event_week"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Percentile upper bounds from a merged histogram: for each requested
    * quantile q, the smallest bin whose cumulative count reaches
    * `ceil(q · total)`, reported as `(event_week, q, bin, upper_edge)` with
    * `upper_edge = lo + (bin + 1) · binWidth` — the "value ≤ edge covers a
    * q fraction" guarantee.
    */
  def percentiles(
      weekly: DataFrame,
      qs: Seq[Double],
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"quantiles must be in (0, 1]: $qs")
    val wCum = Window.partitionBy(col("event_week")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_week"))
    val binWidth = (hi - lo) / nBins
    weekly
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wTot))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .where(col("cum") >= ceil(col("q") * col("total")))
      .groupBy(col("event_week"), col("q"))
      .agg(min(col("bin")).as("bin"))
      .withColumn("upper_edge", lit(lo) + (col("bin") + lit(1L)) * lit(binWidth))
  }

  /** The composed pipeline: daily sketch → weekly merge → percentile bounds.
    * Ordered for the declared query.
    */
  def weeklyValuePercentiles(
      df: DataFrame,
      valueCol: Column,
      dateCol: Column,
      startDate: String,
      endDate: String,
      lo: Double,
      hi: Double,
      nBins: Int,
      qs: Seq[Double]): DataFrame =
    percentiles(
      weeklyRollup(dailyHistogram(df, valueCol, dateCol, startDate, endDate, lo, hi, nBins)),
      qs, lo, hi, nBins)
      .orderBy(col("event_week"), col("q"))
}
