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
  * single-partition plan at ANY partitioning and ANY prefix width — the
  * width only splits the work, never reorders it (IdsSpec pins the
  * invariance). With an md5 sort key the buckets are uniform by
  * construction (p hex chars → 16^p even ranges), which is what makes the
  * width derivable from the row count alone; a skewed NATURAL sort key
  * would need sampled boundaries instead (what Spark's RangePartitioner
  * does).
  */
object Ids {

  /** Per-bucket row bound the auto-derived prefix width targets: each
    * bucket is one window-sort task, so this caps task-local sort work at
    * a constant regardless of corpus size (~tens of MB of keys — well
    * inside executor memory). 16^8 buckets × 4M rows covers 10^13 rows
    * before the cap runs out of width.
    */
  val TargetRowsPerBucket: Long = 4L * 1000 * 1000

  /** Smallest prefix width whose 16^p uniform md5 buckets hold at most
    * [[TargetRowsPerBucket]] rows each for an `n`-row input — the
    * scale-safe default [[assignStableIds]] derives when no explicit width
    * is given. Monotone in `n`; clamps to the 1..8 the bucket decode
    * supports (a `long` holds 8 hex chars).
    */
  def prefixLenFor(n: Long, targetRowsPerBucket: Long = TargetRowsPerBucket): Int = {
    require(n >= 0, s"prefixLenFor: negative row count $n")
    require(targetRowsPerBucket >= 1,
      s"prefixLenFor: targetRowsPerBucket must be >= 1, got $targetRowsPerBucket")
    var p = 1
    var buckets = 16L
    while (p < 8 && n / buckets >= targetRowsPerBucket) { p += 1; buckets *= 16L }
    p
  }

  /** Dense ids over the md5-of-`keyCol` total order, `tieBreak` breaking
    * hash ties (collisions are astronomically unlikely but determinism
    * must not rest on that). A null key hashes like the empty string —
    * EVERY input row gets an id; silently dropping null-keyed rows would
    * break the dense 0..n-1 contract. Output: input columns + `new_id`.
    *
    * `hexPrefixLen = 0` (the default) SIZES THE BUCKETS FROM THE INPUT:
    * one `count()` pass picks the smallest width keeping every bucket at
    * or under [[TargetRowsPerBucket]] rows, so the per-task sort stays
    * constant-bounded at any corpus size — the count is one extra
    * column-free scan, cheap against an unbounded 100-TB-over-256-buckets
    * sort task. Pass an explicit 1..8 to skip the count when the caller
    * already knows the scale.
    */
  def assignStableIds(
      df: DataFrame,
      keyCol: Column,
      tieBreak: Column,
      hexPrefixLen: Int = 0): DataFrame = {
    require(hexPrefixLen >= 0 && hexPrefixLen <= 8,
      s"assignStableIds: hexPrefixLen out of range: $hexPrefixLen")
    val width =
      if (hexPrefixLen > 0) hexPrefixLen
      else prefixLenFor(df.count())
    val keyed = df
      .withColumn("__key", md5(coalesce(keyCol.cast("string"), lit(""))))
      .withColumn("__bucket",
        conv(substring(col("__key"), 1, width), 16, 10).cast("long"))
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
    // The offsets frame has one row per non-empty bucket: force-broadcast
    // while that is KB..MB-scale (width <= 4 → <= 65536 rows); at wider
    // auto-derived widths the frame can reach 10^7 rows, where a hash join
    // on __bucket is right — `ranked` is already hash-partitioned by
    // __bucket from the window, so the exchange is reused and only the
    // offsets side shuffles.
    val joined =
      if (width <= 4) ranked.join(broadcast(offsets), Seq("__bucket"))
      else ranked.join(offsets, Seq("__bucket"))
    joined
      .withColumn("new_id", col("__offset") + col("__rank") - 1L)
      .drop("__key", "__bucket", "__rank", "__offset")
  }
}
