package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: points joined to the intervals containing them,
  * `start <= p <= end`, with NO equi-key required.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin (or a
  * cartesian) — O(|points|·|intervals|) comparisons even when matches are
  * sparse. The standard fix (range-join binning, what Databricks' range-join
  * hint does under the hood): quantize the axis into bins of `binWidth`;
  * each interval registers in every bin it overlaps, each point in exactly
  * one bin, and the join becomes an EQUI-join on the bin id with the exact
  * range predicate re-checked per candidate. Cost is
  * O(|points| + Σ interval spans/binWidth + |candidates|); a point meets an
  * interval in at most one bin (the point's own), so no dedup is needed.
  *
  * `binWidth` tunes candidate volume: ~the typical interval length is right
  * (each interval lands in 1–2 bins and a bin pairs a point with few
  * intervals). An optional `key` turns it into a per-key range join (bin
  * AND key equi-join) — use when intervals are dense globally but sparse
  * per key.
  *
  * Inputs are (long) positions, e.g. epoch seconds — the caller projects
  * timestamps down with `unix_timestamp` (whole-second semantics, matching
  * the engine's session arithmetic).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      key: Option[String] = None): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not carry __bin")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")

    val binnedIntervals = intervals.withColumn(
      "__bin", explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val binnedPoints = points.withColumn("__bin", bin(col(pointCol)))
    val joinKeys = "__bin" +: key.toSeq
    binnedPoints.join(binnedIntervals, joinKeys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
