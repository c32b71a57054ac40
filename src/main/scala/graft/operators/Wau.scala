package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weekly-active-users — the reference's flagship analytic
  * (`/root/reference/src/main/scala/transformer/UserIdBaseWauTransformer.scala:20-40`
  * and `SessionIdBaseWauTransformer.scala:20-40`).
  *
  * Semantics: project `date_trunc('week', <date>)` (Monday-start), filter the
  * week between the truncated start/end (inclusive both ends), then
  * `COUNT(DISTINCT key)` per week, ordered ascending.
  *
  * Scale notes: COUNT(DISTINCT) is planned by Catalyst as a two-phase
  * aggregate — partial dedup on (week, key) map-side, then merge — so the
  * shuffle carries one row per distinct (week, key), not per event. For
  * 100 TB-scale interactive use, [[wauApprox]] swaps in HyperLogLog++
  * (`approx_count_distinct`), collapsing the shuffle to one sketch per week.
  */
object Wau {

  /** Truncate to Monday-start week as a DATE (both Spark and ANSI SQL agree). */
  def week(c: Column): Column = to_date(date_trunc("week", c))

  def wau(
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      startDate: String,
      endDate: String): DataFrame = {
    val lo = week(to_timestamp(lit(startDate)))
    val hi = week(to_timestamp(lit(endDate)))
    df.select(week(dateCol).as("event_week"), col(keyCol))
      .where(col("event_week").between(lo, hi))
      .groupBy(col("event_week"))
      .agg(countDistinct(col(keyCol)).as("wau"))
      .orderBy(col("event_week"))
  }

  /** Two-stage sketch-merge WAU — the incremental-aggregation shape a
    * 100 TB pipeline actually runs: stage 1 builds ONE mergeable
    * DataSketches-HLL per (week, day) — the column a daily job would
    * persist to its rollup table — and stage 2 unions the day sketches into
    * week estimates WITHOUT rescanning raw events. Appending a new day
    * touches one sketch row, not 100 TB of history; the same pattern nests
    * for month/quarter rollups (sketch unions are associative).
    *
    * Not oracle-compared (approximate by construction); WauSpec bounds the
    * estimate against the exact [[wau]] and proves day-split invariance
    * (union of partial sketches == sketch of the union).
    */
  def wauSketchRollup(
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      startDate: String,
      endDate: String,
      lgK: Int = 14): DataFrame = {
    val lo = week(to_timestamp(lit(startDate)))
    val hi = week(to_timestamp(lit(endDate)))
    val daily = df.select(
      week(dateCol).as("event_week"),
      to_date(dateCol).as("event_day"),
      col(keyCol))
      .where(col("event_week").between(lo, hi))
      .groupBy(col("event_week"), col("event_day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sketch"))
    daily
      .groupBy(col("event_week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("wau_est"))
      .orderBy(col("event_week"))
  }

  /** Self-validating wrapper: joins an approximate weekly count against the
    * exact [[wau]] and emits `(event_week, wau_exact, within_tol)` where
    * `within_tol = |est − exact| ≤ tol·exact`. The estimate itself is NOT in
    * the output on purpose — a sketch value is not SQL-replayable, but the
    * boolean is: the DuckDB oracle computes the exact count and asserts
    * `TRUE`, so a sketch drifting past `tol` flips the boolean and fails the
    * hash compare. This turns the two approximate queries from rows-only
    * checks into real oracle entries.
    *
    * Scale note: the exact branch is the validation harness, not the serving
    * path — production serves [[wauApprox]]/[[wauSketchRollup]] alone and
    * runs this composite on a sampled partition or in CI. The join is
    * per-week (a handful of rows), broadcast by AQE.
    */
  def wauValidated(
      approx: DataFrame,
      estCol: String,
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      startDate: String,
      endDate: String,
      tol: Double = 0.05): DataFrame = {
    val exact = wau(df, keyCol, dateCol, startDate, endDate)
    approx.join(exact, "event_week")
      .select(
        col("event_week"),
        col("wau").as("wau_exact"),
        (abs(col(estCol).cast("double") - col("wau")) <= col("wau") * tol).as("within_tol"))
      .orderBy(col("event_week"))
  }

  /** HLL++ variant for interactive queries over 100 TB (not oracle-compared —
    * approximate by construction).
    */
  def wauApprox(
      df: DataFrame,
      keyCol: String,
      dateCol: Column,
      startDate: String,
      endDate: String,
      rsd: Double = 0.01): DataFrame = {
    val lo = week(to_timestamp(lit(startDate)))
    val hi = week(to_timestamp(lit(endDate)))
    df.select(week(dateCol).as("event_week"), col(keyCol))
      .where(col("event_week").between(lo, hi))
      .groupBy(col("event_week"))
      .agg(approx_count_distinct(col(keyCol), rsd).as("wau_approx"))
      .orderBy(col("event_week"))
  }
}
