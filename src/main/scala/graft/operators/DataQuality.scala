package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the Deequ-style contract
  * check a warehouse runs on every landed batch (completeness, uniqueness,
  * domain membership, bounds), evaluated in ONE pass.
  *
  * The scale property is the evaluation shape, not the checks themselves:
  * every expectation is expressed as an AGGREGATE metric, so the whole
  * suite collapses into a single `df.agg(...)` — one scan, map-side
  * partial aggregation, one 1-row exchange — no matter how many checks are
  * registered. Running N checks as N queries rescans the table N times;
  * at 100 TB that is the difference between a nightly audit and an
  * impossible one. The uniform `(check_name, metric, threshold, passed)`
  * rows come from exploding the single aggregated row, a driver-side
  * constant-cost step.
  *
  * Violation-count checks (`expectZero`) make the metric the number of
  * OFFENDING rows, so a failure is directly actionable ("17 rows violate")
  * and the pass predicate (`= 0`) is exact integer arithmetic — no
  * double-threshold ambiguity in the hash-compared output.
  */
object DataQuality {

  /** One expectation: `metric` must be an aggregate expression; `passed`
    * receives the computed metric column and returns a boolean.
    */
  final case class Check(name: String, metric: Column, passed: Column => Column)

  /** Rows that violate `pred` — the actionable violation counter. */
  def countViolations(pred: Column): Column =
    sum(when(pred, 1L).otherwise(0L))

  /** `pred` must hold on EVERY row: metric = violation count, pass = 0. */
  def expectZero(name: String, violation: Column): Check =
    Check(name, countViolations(violation), _ === 0.0)

  /** `keyCol` must be unique and non-null: metric = duplicate+null count
    * (each extra copy of a duplicated key counts, and every null counts —
    * the PK law from [[Audit.dupPrimaryKeys]]).
    */
  def expectUniqueKey(name: String, key: Column): Check =
    Check(name, count(lit(1)) - countDistinct(key), _ === 0.0)

  /** Evaluate the whole suite in one aggregate pass. Output one row per
    * check: `(check_name, metric double, passed boolean)`, in the order
    * the checks were given (tag rows with `check_rank` for a stable sort).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"check names must be unique, got ${checks.map(_.name)}")
    val metrics = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast("double").as(s"m_$i")
    }
    val row = df.agg(metrics.head, metrics.tail: _*)
    val packed = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(i.toLong).as("check_rank"),
        lit(c.name).as("check_name"),
        col(s"m_$i").as("metric"),
        c.passed(col(s"m_$i")).as("passed"))
    }
    row
      .select(explode(array(packed: _*)).as("r"))
      .select(col("r.check_rank"), col("r.check_name"), col("r.metric"), col("r.passed"))
  }

  /** One-pass column profiler — the per-column statistics a catalog's data
    * card shows (and `ANALYZE TABLE` collects for the CBO): row count,
    * null count, distinct cardinality, min/max. ONE aggregate scan
    * regardless of how many columns are profiled (the [[run]] shape: all
    * metrics ride a single `agg`), with HLL++ sketches (rsd 1%) carrying
    * the cardinalities.
    *
    * At fixture scale a second one-pass aggregate computes the EXACT
    * distinct counts and the output hashes those plus a tolerance boolean
    * the sketch must satisfy (the self-validation discipline — estimates
    * never enter hashed columns). At 100 TB the serving path drops the
    * exact branch and reads the sketches alone; `approxOnly = true` is
    * that mode.
    *
    * Columns are `(name, expr)` so callers can normalize types at the
    * boundary (e.g. cast a timestamp to date) — min/max render as strings
    * for a uniform row shape, so only pass expressions whose string form
    * is engine-stable (integers, strings, dates).
    */
  def profile(
      df: DataFrame,
      cols: Seq[(String, Column)],
      tol: Double = 0.05,
      approxOnly: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nulls_$i"),
        approx_count_distinct(c, 0.01).as(s"ad_$i"),
        min(c).cast("string").as(s"min_$i"),
        max(c).cast("string").as(s"max_$i"))
    } :+ count(lit(1)).as("n_rows")
    val prof = df.agg(aggs.head, aggs.tail: _*)
    val withExact =
      if (approxOnly) prof
      else {
        val exacts = cols.zipWithIndex.map { case ((_, c), i) =>
          countDistinct(c).as(s"ed_$i")
        }
        prof.crossJoin(broadcast(df.agg(exacts.head, exacts.tail: _*)))
      }
    val packed = cols.zipWithIndex.map { case ((name, _), i) =>
      val nd =
        if (approxOnly) col(s"ad_$i").as("n_distinct")
        else col(s"ed_$i").as("n_distinct")
      val ok =
        if (approxOnly) lit(true).as("approx_ok")
        else (abs(col(s"ad_$i").cast("double") - col(s"ed_$i")) <=
          col(s"ed_$i") * tol + 1.0).as("approx_ok")
      struct(
        lit(name).as("col_name"), col("n_rows"), col(s"nulls_$i").as("n_nulls"),
        nd, col(s"min_$i").as("min_v"), col(s"max_$i").as("max_v"), ok)
    }
    withExact
      .select(explode(array(packed: _*)).as("p"))
      .select(
        col("p.col_name"), col("p.n_rows"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_v"), col("p.max_v"), col("p.approx_ok"))
      .orderBy(col("col_name"))
  }
}
