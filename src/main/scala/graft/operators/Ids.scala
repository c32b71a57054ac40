package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable contiguous ID assignment — give every row of a corpus a dense id
  * `0..n-1` in a deterministic total order WITHOUT the global
  * single-partition sort that `row_number() OVER (ORDER BY …)` plans (one
  * task sorting 100 TB is not a plan). The classic scalable zipWithIndex,
  * DataFrame-native:
  *
  *  1. BUCKET each row by a fixed-width PREFIX of its sort key — prefix
  *     order is key order, so buckets are contiguous key ranges.
  *  2. Rank within each bucket (window partitioned by bucket — parallel
  *     across buckets, each task sorts only its bucket).
  *  3. Offset each bucket by the total size of all earlier buckets (a
  *     buckets-sized frame: counts → running sum → broadcast back).
  *
  * `id = bucket_offset + rank_in_bucket − 1` is then the exact
  * `row_number − 1` of the global order, bit-identical to the
  * single-partition plan at any partitioning. With an md5 sort key the
  * buckets are uniform by construction (two hex chars → 256 even ranges);
  * for skewed natural keys widen the prefix or pre-sample boundaries
  * (what Spark's own RangePartitioner does).
  */
object Ids {

  /** Dense ids over the md5-of-`keyCol` total order, `tieBreak` breaking
    * hash ties (collisions are astronomically unlikely but determinism
    * must not rest on that). A null key hashes like the empty string —
    * EVERY input row gets an id; silently dropping null-keyed rows would
    * break the dense 0..n-1 contract. Output: input columns + `new_id`.
    */
  def assignStableIds(
      df: DataFrame,
      keyCol: Column,
      tieBreak: Column,
      hexPrefixLen: Int = 2): DataFrame = {
    require(hexPrefixLen >= 1 && hexPrefixLen <= 8,
      s"assignStableIds: hexPrefixLen out of range: $hexPrefixLen")
    val keyed = df
      .withColumn("__key", md5(coalesce(keyCol.cast("string"), lit(""))))
      .withColumn("__bucket",
        conv(substring(col("__key"), 1, hexPrefixLen), 16, 10).cast("long"))
    val ranked = keyed.withColumn("__rank",
      row_number().over(
        Window.partitionBy(col("__bucket")).orderBy(col("__key"), tieBreak)))
    val offsets = keyed
      .groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy(col("__bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bucket"), col("__offset"))
    ranked
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("new_id", col("__offset") + col("__rank") - 1L)
      .drop("__key", "__bucket", "__rank", "__offset")
  }
}
