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
}
