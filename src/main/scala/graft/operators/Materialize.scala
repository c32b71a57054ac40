package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for mergeable aggregates.
  *
  * The 100 TB shape: a summary table (weekly/daily rollups) must absorb a
  * new partition of raw data WITHOUT rescanning the base — the new batch is
  * partially aggregated (one delta-sized pass) and merged into the
  * summary-sized state by re-aggregating the union on the grouping keys.
  * That only works for MERGEABLE aggregates — `sum`/`count` merge by
  * addition, `min`/`max` by themselves — which is why the engine's
  * distinct-ish rollups ship as sketches instead ([[graft.operators.Wau]]
  * `wauSketchRollup`, [[CountMin]], [[Histograms]]): this operator is their
  * EXACT counterpart for the algebraic aggregate classes.
  *
  * Cost: one shuffle whose cardinality is the SUMMARY key space (weeks, not
  * events) plus the delta scan; the base table is never read. Contrast a
  * recompute, which rescans everything — the validation arm of the
  * `mv_incremental` query does exactly that recompute to prove the merge
  * exact, and a production run simply drops that arm.
  */
object Materialize {

  /** Merge partial summaries sharing a schema: group by `keys`, summing
    * `sumCols` (counts/sums), min-ing `minCols`, max-ing `maxCols`. The
    * merge is associative and commutative, so any batching order — per
    * partition, per day, per region — yields the identical summary.
    */
  def mergeSummaries(
      parts: Seq[DataFrame],
      keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    require(parts.nonEmpty, "mergeSummaries: need at least one partial summary")
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "mergeSummaries: no aggregate columns given")
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
