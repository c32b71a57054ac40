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

  /** RETRACTABLE maintenance: absorb a change batch containing DELETES as
    * well as inserts, still without touching the base — the classic
    * incremental view-maintenance algebra for the ADDITIVE aggregate
    * class: counts and sums form a group (every row has an inverse —
    * negate its contribution), so
    * `summary' = summary + agg(inserts) − agg(deletes)`, merged by one
    * summary-key-spaced re-aggregation. Groups whose count reaches zero
    * VANISH (a recompute would produce no row for them). `min`/`max` are
    * NOT retractable — a deleted extremum needs the base's next-best
    * (semilattice, no inverse); route those through [[mergeSummaries]]
    * over a recomputed affected-partition slice, the standard contract.
    *
    * `summary` carries `(keys, countCol, sumCols)` with sums TOTALED under
    * the same names the raw change rows carry per-row; `deletes` must be
    * full images of previously-inserted rows (the [[Cdc]] feed contract) —
    * retracting a row never inserted would UNDERFLOW a group, and the
    * count guard fails the job loudly instead of publishing a negative.
    */
  def applyRetractions(
      summary: DataFrame,
      inserts: DataFrame,
      deletes: DataFrame,
      keys: Seq[String],
      countCol: String,
      sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyRetractions: need at least one grouping key")
    def part(df: DataFrame, sign: Int): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(
          (count(lit(1)) * sign).as(countCol),
          sumCols.map(c => (sum(col(c)) * sign).as(c)): _*)
    val ordered = keys.map(col) ++ (countCol +: sumCols).map(col)
    val merged = Seq(summary, part(inserts, 1), part(deletes, -1))
      .map(_.select(ordered: _*))
      .reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(countCol)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
    merged
      .withColumn(
        countCol,
        when(col(countCol) >= 0, col(countCol)).otherwise(raise_error(concat(
          lit("applyRetractions: group ("),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*),
          lit(s") underflowed — a delete retracted rows never inserted")))))
      .where(col(countCol) > 0)
  }

  /** Incremental maintenance of a JOIN view — the classic delta rule for
    * inner equi-joins:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * Returns exactly the rows to APPEND to the maintained view; the base
    * join `A_old ⋈ B_old` is never recomputed (that is the whole point —
    * the complement of [[applyRetractions]]' additive-aggregate class,
    * covering the join operator itself). Insert-only deltas; deletes
    * route through the tombstone/retraction machinery upstream.
    *
    * Scale shape: all three legs are equi-joins keyed on `keys`, and each
    * is delta-sized on at least one side — ΔA⋈B and A⋈ΔB broadcast the
    * delta when it is batch-small (AQE decides), ΔA⋈ΔB is delta×delta.
    * Maintenance cost scales with the CHANGE, not the view: at 100 TB the
    * base sides stay bucketed/pruned on the join key and only the delta
    * shuffles in full.
    *
    * Non-key columns of the two sides must be disjoint (the join-view
    * schema is `keys ++ A-cols ++ B-cols`); checked loudly.
    */
  def joinDelta(
      aOld: DataFrame,
      aDelta: DataFrame,
      bOld: DataFrame,
      bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta: need at least one join key")
    val aCols = aOld.columns.toSet -- keys
    val bCols = bOld.columns.toSet -- keys
    val clash = aCols.intersect(bCols)
    require(clash.isEmpty,
      s"joinDelta: non-key columns collide across sides: ${clash.toSeq.sorted.mkString(", ")}")
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))
  }
}
