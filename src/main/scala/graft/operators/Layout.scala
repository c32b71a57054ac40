package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and the
  * zone-map file-skipping win it buys over a linear sort.
  *
  * At 100 TB, queries carrying predicates on MORE THAN ONE column are the
  * norm (tenant + time, source + date, user + day), and a table sorted on a
  * single column only prunes on that column: every file's min/max range on
  * the second column spans the whole domain. Interleaving the bits of
  * per-column RANGE-BUCKET ids (the public Delta/Iceberg `OPTIMIZE ZORDER`
  * design: bucket each column by value rank, then Morton-interleave the
  * bucket ids) gives every file a tight min/max box on EVERY participating
  * column, so a box predicate skips all files whose box misses it.
  *
  * Fixture vs cluster shape: here the per-column bucket id is computed with
  * an exact global `rank()` so the DuckDB oracle replays it bitwise; on a
  * cluster the identical bucket id comes from sampled range boundaries
  * (`repartitionByRange`'s sampling, Delta's `range_partition_id`) — a
  * map-side lookup against ~2^dimBits broadcast boundaries, no global sort.
  * Everything downstream of the bucket ids (interleave, file assignment,
  * zone-map min/max, skip decision) is one map-side pass plus one
  * `groupBy(file_id)` whose cardinality is the FILE COUNT, not the row
  * count.
  */
object Layout {

  /** Morton interleave of two bucket ids in `[0, 2^bits)`: bit `i` of `x`
    * lands at position `2i`, bit `i` of `y` at `2i+1`. Pure integer
    * arithmetic (shift / mask / add) so any engine replays it exactly.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL over columns named `xb`/`yb`, for the
    * DuckDB oracle (`>>`, `&` and `*` on BIGINT).
    */
  def zorderKeySql(bits: Int): String =
    (0 until bits).map { i =>
      s"((xb >> $i) & 1) * ${1L << (2 * i)} + ((yb >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Scan-efficiency report for a box predicate `xLo<=x<=xHi AND
    * yLo<=y<=yHi` under two file layouts over the same rows:
    *
    *  - `linear`: files are contiguous runs of the lexicographic key
    *    `(y_bucket, x_bucket)` — the single-column time-sorted layout.
    *  - `zorder`: files are contiguous runs of the Morton key over the same
    *    bucket ids.
    *
    * Both layouts cut the SAME `2^(2*dimBits)` key domain into
    * `2^fileBits` equal-count files (`(row_rank-1) * nFiles div n_total`),
    * carry a zone map (min/max of the RAW x and y) per file, and scan a
    * file iff its box intersects the predicate box. Output, one row per
    * layout: file counts, files/rows scanned, rows actually matching, and
    * the read amplification in ppm — all integers, hash-compared against
    * the oracle's identical replay.
    */
  /** Range-bucket both columns by exact rank and attach the Morton and
    * lexicographic keys — the shared head of the simulated report
    * ([[scanEfficiency]]) and the physical write ([[writeLayout]]), factored
    * so the two cannot drift. Output columns: `x, y, n_total, xb, yb,
    * z_key, lex_key`.
    */
  private def mortonKeyed(df: DataFrame, x: Column, y: Column, dimBits: Int): DataFrame = {
    val nBuckets = 1L << dimBits
    val base = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
    // Delta-style per-column range buckets: rank ties share a bucket, so no
    // tie-break column is needed and the oracle's rank() agrees exactly.
    base
      .withColumn("rank_x", rank().over(Window.orderBy(col("x"))))
      .withColumn("rank_y", rank().over(Window.orderBy(col("y"))))
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy()))
      .withColumn("xb", expr(s"(rank_x - 1) * ${nBuckets}L div n_total"))
      .withColumn("yb", expr(s"(rank_y - 1) * ${nBuckets}L div n_total"))
      .withColumn("z_key", zorderKey(col("xb"), col("yb"), dimBits))
      .withColumn("lex_key", col("yb") * lit(nBuckets) + col("xb"))
      .select(col("x"), col("y"), col("n_total"), col("xb"), col("yb"),
        col("z_key"), col("lex_key"))
  }

  def scanEfficiency(
      df: DataFrame,
      x: Column,
      y: Column,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): DataFrame = {
    require(dimBits >= 1 && dimBits <= 20, s"dimBits out of range: $dimBits")
    require(fileBits >= 1 && fileBits <= 2 * dimBits, s"fileBits out of range: $fileBits")
    val nFiles = 1L << fileBits
    val keyed = mortonKeyed(df, x, y, dimBits)

    def layout(keyCol: String, name: String): DataFrame = {
      val zoned = keyed
        .withColumn(
          "file_id",
          expr(s"(rank() OVER (ORDER BY $keyCol) - 1) * ${nFiles}L div n_total"))
        .groupBy(col("file_id"))
        .agg(
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          count(lit(1)).as("n_rows"),
          sum(when(col("x").between(xLo, xHi) && col("y").between(yLo, yHi), 1L)
            .otherwise(0L)).as("n_match"))
      val hit = col("max_x") >= xLo && col("min_x") <= xHi &&
        col("max_y") >= yLo && col("min_y") <= yHi
      zoned.agg(
        count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matching"))
        .select(
          lit(name).as("layout"), col("n_files"), col("files_scanned"),
          col("rows_scanned"), col("rows_matching"),
          expr("rows_scanned * 1000000 div greatest(rows_matching, 1)")
            .as("amplification_ppm"))
    }

    layout("z_key", "zorder").unionByName(layout("lex_key", "linear"))
      .orderBy(col("layout"))
  }

  /** The oracle replay of [[scanEfficiency]] as one SQL string over a table
    * expression `src` that must yield BIGINT columns `x` and `y`.
    */
  def scanEfficiencySql(
      src: String,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): String = {
    val nBuckets = 1L << dimBits
    val nFiles = 1L << fileBits
    s"""WITH base AS ($src),
       |ranked AS (
       |  SELECT x, y,
       |         (rank() OVER (ORDER BY x) - 1) * $nBuckets // count(*) OVER () AS xb,
       |         (rank() OVER (ORDER BY y) - 1) * $nBuckets // count(*) OVER () AS yb,
       |         count(*) OVER () AS n_total
       |  FROM base
       |), keyed AS (
       |  SELECT x, y, n_total,
       |         ${zorderKeySql(dimBits)} AS z_key,
       |         yb * $nBuckets + xb AS lex_key
       |  FROM ranked
       |), zoned AS (
       |  SELECT layout, file_id,
       |         min(x) AS min_x, max(x) AS max_x,
       |         min(y) AS min_y, max(y) AS max_y,
       |         count(*) AS n_rows,
       |         sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
       |                  THEN 1 ELSE 0 END) AS n_match
       |  FROM (
       |    SELECT 'zorder' AS layout, x, y,
       |           (rank() OVER (ORDER BY z_key) - 1) * $nFiles // n_total AS file_id
       |    FROM keyed
       |    UNION ALL
       |    SELECT 'linear' AS layout, x, y,
       |           (rank() OVER (ORDER BY lex_key) - 1) * $nFiles // n_total AS file_id
       |    FROM keyed
       |  )
       |  GROUP BY layout, file_id
       |)
       |SELECT layout,
       |       count(*) AS n_files,
       |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       |       CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       |       CAST(sum(n_match) AS BIGINT) AS rows_matching,
       |       CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) * 1000000
       |         // greatest(sum(n_match), 1) AS BIGINT) AS amplification_ppm
       |FROM (
       |  SELECT *, (max_x >= $xLo AND min_x <= $xHi AND
       |             max_y >= $yLo AND min_y <= $yHi) AS hit
       |  FROM zoned
       |)
       |GROUP BY layout
       |ORDER BY layout""".stripMargin
  }

  /** Append the HILBERT index of bucket ids `xbCol`/`ybCol` in
    * `[0, 2^bits)` as column `out` — the space-filling curve that, unlike
    * Morton, has NO long jumps: consecutive curve positions are always
    * grid neighbors (|Δx|+|Δy| = 1, the property [[graft.LayoutSpec]]
    * pins exhaustively), which is why Hilbert clustering yields tighter
    * per-file boxes than z-order at the same file count and is what
    * production layout engines reach for beyond ZORDER.
    *
    * This is the textbook xy2d walk (public algorithm): per bit level,
    * accumulate `s²·((3·rx) XOR ry)` and rotate the quadrant frame
    * (flip + swap when ry=0). The rotation makes levels STATEFUL — each
    * level rewrites the working (x, y) — so the unroll materializes one
    * projection per level (`withColumn`, evaluated once) instead of one
    * exponentially-shared expression tree. All pure integer arithmetic:
    * the oracle replays the identical chain ([[hilbertKeySqlCtes]])
    * bitwise. Cost: `bits` narrow projections inside one codegen stage —
    * map-side, no shuffle.
    */
  def withHilbertKey(
      df: DataFrame, xbCol: String, ybCol: String, bits: Int, out: String): DataFrame = {
    require(bits >= 1 && bits <= 20, s"withHilbertKey: bits out of range: $bits")
    var cur = df
      .withColumn("__hx", col(xbCol))
      .withColumn("__hy", col(ybCol))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__hx").bitwiseAND(lit(s)) =!= 0L, 1L).otherwise(0L)
      val ry = when(col("__hy").bitwiseAND(lit(s)) =!= 0L, 1L).otherwise(0L)
      cur = cur
        .withColumn("__rx", rx)
        .withColumn("__ry", ry)
        .withColumn(out,
          col(out) + lit(s * s) * (col("__rx") * lit(3L)).bitwiseXOR(col("__ry")))
        .withColumn("__fx",
          when(col("__ry") === 0L && col("__rx") === 1L, lit(s - 1L) - col("__hx"))
            .otherwise(col("__hx")))
        .withColumn("__fy",
          when(col("__ry") === 0L && col("__rx") === 1L, lit(s - 1L) - col("__hy"))
            .otherwise(col("__hy")))
        .withColumn("__hx", when(col("__ry") === 0L, col("__fy")).otherwise(col("__fx")))
        .withColumn("__hy", when(col("__ry") === 0L, col("__fx")).otherwise(col("__fy")))
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__fx", "__fy")
  }

  /** The oracle replay of [[withHilbertKey]] as a chain of CTEs: enters at
    * `$from` (which must carry `hx`, `hy`, `hd`) and exits at `hl0` with
    * the final `hd` and the working registers dropped. One CTE per level —
    * the same stateful unroll, in ANSI SQL (`>>`, `&`, `xor`, CASE).
    */
  def hilbertKeySqlCtes(bits: Int, from: String): String = {
    // two CTEs per level: compute into FRESH names (nhd/nhx/nhy), then
    // rename back — a single SELECT redefining `hx` while later
    // expressions still read `hx` would silently bind the NEW column
    // under lateral-column-alias scoping
    val levels = ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val src = if (i == bits - 1) from else s"hl${i + 1}"
      s"""hc$i AS (
         |  SELECT *,
         |    hd + ${s * s} * xor(3 * ((hx >> $i) & 1), (hy >> $i) & 1) AS nhd,
         |    CASE WHEN ((hy >> $i) & 1) = 0
         |         THEN (CASE WHEN ((hx >> $i) & 1) = 1 THEN ${s - 1} - hy ELSE hy END)
         |         ELSE hx END AS nhx,
         |    CASE WHEN ((hy >> $i) & 1) = 0
         |         THEN (CASE WHEN ((hx >> $i) & 1) = 1 THEN ${s - 1} - hx ELSE hx END)
         |         ELSE hy END AS nhy
         |  FROM $src
         |),
         |hl$i AS (
         |  SELECT * EXCLUDE (hx, hy, hd, nhx, nhy, nhd),
         |         nhd AS hd, nhx AS hx, nhy AS hy
         |  FROM hc$i
         |)""".stripMargin
    }
    levels.mkString(",\n")
  }

  /** [[scanEfficiency]] extended with the HILBERT layout: one report row
    * per layout (`hilbert`, `linear`, `zorder`) over the identical
    * rank-bucket grid, equal-count file split, zone-map scan rule, and
    * box predicate — so the three curves are compared on exactly the
    * same geometry and the hashed integers prove which one scans less.
    */
  def scanEfficiencyHilbert(
      df: DataFrame,
      x: Column,
      y: Column,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): DataFrame = {
    require(dimBits >= 1 && dimBits <= 20, s"dimBits out of range: $dimBits")
    require(fileBits >= 1 && fileBits <= 2 * dimBits, s"fileBits out of range: $fileBits")
    val nFiles = 1L << fileBits
    val keyed = withHilbertKey(mortonKeyed(df, x, y, dimBits), "xb", "yb", dimBits, "h_key")

    def layout(keyCol: String, name: String): DataFrame = {
      val zoned = keyed
        .withColumn(
          "file_id",
          expr(s"(rank() OVER (ORDER BY $keyCol) - 1) * ${nFiles}L div n_total"))
        .groupBy(col("file_id"))
        .agg(
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"),
          count(lit(1)).as("n_rows"),
          sum(when(col("x").between(xLo, xHi) && col("y").between(yLo, yHi), 1L)
            .otherwise(0L)).as("n_match"))
      val hit = col("max_x") >= xLo && col("min_x") <= xHi &&
        col("max_y") >= yLo && col("min_y") <= yHi
      zoned.agg(
        count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matching"))
        .select(
          lit(name).as("layout"), col("n_files"), col("files_scanned"),
          col("rows_scanned"), col("rows_matching"),
          expr("rows_scanned * 1000000 div greatest(rows_matching, 1)")
            .as("amplification_ppm"))
    }

    layout("h_key", "hilbert")
      .unionByName(layout("lex_key", "linear"))
      .unionByName(layout("z_key", "zorder"))
      .orderBy(col("layout"))
  }

  /** The oracle replay of [[scanEfficiencyHilbert]]: the [[scanEfficiencySql]]
    * pipeline with the Hilbert CTE chain threaded between the bucket and
    * file-assignment stages.
    */
  def scanEfficiencyHilbertSql(
      src: String,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): String = {
    val nBuckets = 1L << dimBits
    val nFiles = 1L << fileBits
    s"""WITH base AS ($src),
       |ranked AS (
       |  SELECT x, y,
       |         (rank() OVER (ORDER BY x) - 1) * $nBuckets // count(*) OVER () AS xb,
       |         (rank() OVER (ORDER BY y) - 1) * $nBuckets // count(*) OVER () AS yb,
       |         count(*) OVER () AS n_total
       |  FROM base
       |), keyed AS (
       |  SELECT x, y, n_total, xb, yb,
       |         ${zorderKeySql(dimBits)} AS z_key,
       |         yb * $nBuckets + xb AS lex_key,
       |         xb AS hx, yb AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM ranked
       |),
       |${hilbertKeySqlCtes(dimBits, "keyed")},
       |zoned AS (
       |  SELECT layout, file_id,
       |         min(x) AS min_x, max(x) AS max_x,
       |         min(y) AS min_y, max(y) AS max_y,
       |         count(*) AS n_rows,
       |         sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
       |                  THEN 1 ELSE 0 END) AS n_match
       |  FROM (
       |    SELECT 'hilbert' AS layout, x, y,
       |           (rank() OVER (ORDER BY hd) - 1) * $nFiles // n_total AS file_id
       |    FROM hl0
       |    UNION ALL
       |    SELECT 'zorder' AS layout, x, y,
       |           (rank() OVER (ORDER BY z_key) - 1) * $nFiles // n_total AS file_id
       |    FROM hl0
       |    UNION ALL
       |    SELECT 'linear' AS layout, x, y,
       |           (rank() OVER (ORDER BY lex_key) - 1) * $nFiles // n_total AS file_id
       |    FROM hl0
       |  )
       |  GROUP BY layout, file_id
       |)
       |SELECT layout,
       |       count(*) AS n_files,
       |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       |       CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       |       CAST(sum(n_match) AS BIGINT) AS rows_matching,
       |       CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) * 1000000
       |         // greatest(sum(n_match), 1) AS BIGINT) AS amplification_ppm
       |FROM (
       |  SELECT *, (max_x >= $xLo AND min_x <= $xHi AND
       |             max_y >= $yLo AND min_y <= $yHi) AS hit
       |  FROM zoned
       |)
       |GROUP BY layout
       |ORDER BY layout""".stripMargin
  }

  /** PHYSICAL layout write — the half [[scanEfficiency]] only simulates:
    * actually sort the rows by the clustering key (Morton when `morton`,
    * lexicographic `(y_bucket, x_bucket)` otherwise), cut them into
    * `2^fileBits` equal-count file groups, and write ONE parquet file per
    * group (`file_id` is a write-partition directory; each id lives in
    * exactly one task after the hash repartition, so each directory holds
    * exactly one file). Rows are additionally sorted by the key WITHIN each
    * file so row-group/page statistics are tight too. The written files
    * carry REAL parquet min/max column statistics — a box predicate read
    * back over this layout skips row groups through the pushed filters, and
    * the footer stats are independently checkable ([[graft.LayoutSpec]]
    * reads them with parquet-hadoop and pins predicted == actual skipping).
    *
    * File assignment uses the same exact-rank equal-count rule as the
    * simulation (deterministic, oracle-replayable); a cluster writes the
    * identical shape with sampled range boundaries
    * (`repartitionByRange(nFiles, z_key)`) — no global-rank bottleneck, same
    * file semantics. Bounded file size = n_total / 2^fileBits rows by
    * construction.
    */
  def writeLayout(
      df: DataFrame,
      x: Column,
      y: Column,
      dimBits: Int,
      fileBits: Int,
      morton: Boolean,
      path: String): Unit = {
    require(dimBits >= 1 && dimBits <= 20, s"dimBits out of range: $dimBits")
    require(fileBits >= 1 && fileBits <= 2 * dimBits, s"fileBits out of range: $fileBits")
    val nFiles = 1L << fileBits
    val keyCol = if (morton) "z_key" else "lex_key"
    mortonKeyed(df, x, y, dimBits)
      .withColumn(
        "file_id",
        expr(s"(rank() OVER (ORDER BY $keyCol) - 1) * ${nFiles}L div n_total"))
      .repartition(col("file_id"))
      .sortWithinPartitions(col(keyCol))
      .select(col("x"), col("y"), col("file_id"))
      .write.mode("overwrite").partitionBy("file_id").parquet(path)
  }

  /** Executed-plan probe for the most recent manifest-driven scan — lets
    * LayoutSpec pin that the file selection reached the read as
    * PartitionFilters on the `file_id` directory column.
    */
  @volatile private[graft] var lastManifestScanPlan: String = ""

  /** Oracle replay for the manifest-driven scan: the same rank-bucket →
    * Morton → equal-count file assignment, the per-file zone boxes, the
    * boxes intersecting the predicate (the skip count), and the box
    * aggregate over ONLY the selected files' rows — zone maps have no
    * false negatives, so this equals the plain box aggregate, and the hash
    * locks both the skip arithmetic and the result.
    */
  def manifestScanSql(
      src: String,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): String = {
    val nBuckets = 1L << dimBits
    val nFiles = 1L << fileBits
    s"""WITH base AS ($src),
       |ranked AS (
       |  SELECT x, y,
       |         (rank() OVER (ORDER BY x) - 1) * $nBuckets // count(*) OVER () AS xb,
       |         (rank() OVER (ORDER BY y) - 1) * $nBuckets // count(*) OVER () AS yb,
       |         count(*) OVER () AS n_total
       |  FROM base
       |), keyed AS (
       |  SELECT x, y, n_total, ${zorderKeySql(dimBits)} AS z_key
       |  FROM ranked
       |), fid AS (
       |  SELECT x, y,
       |         (rank() OVER (ORDER BY z_key) - 1) * $nFiles // n_total AS file_id
       |  FROM keyed
       |), zones AS (
       |  SELECT file_id, min(x) AS mnx, max(x) AS mxx,
       |         min(y) AS mny, max(y) AS mxy
       |  FROM fid GROUP BY file_id
       |), hits AS (
       |  SELECT file_id FROM zones
       |  WHERE mxx >= $xLo AND mnx <= $xHi AND mxy >= $yLo AND mny <= $yHi
       |)
       |SELECT (SELECT count(*) FROM zones) AS n_files_total,
       |       (SELECT count(*) FROM hits) AS n_files_scanned,
       |       count(*) AS n_match,
       |       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y
       |FROM fid
       |WHERE file_id IN (SELECT file_id FROM hits)
       |  AND x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi""".stripMargin
  }

  /** Oracle replay for the write-then-read query: per layout, the distinct
    * file-id count the equal-count rule produces (rank ties can merge
    * neighbors, so this is computed, not assumed `2^fileBits`) and the box
    * predicate's aggregate — which is layout-invariant, proving the
    * physical rewrite lost and duplicated nothing.
    */
  def writeReadSql(
      src: String,
      dimBits: Int,
      fileBits: Int,
      xLo: Long,
      xHi: Long,
      yLo: Long,
      yHi: Long): String = {
    val nBuckets = 1L << dimBits
    val nFiles = 1L << fileBits
    s"""WITH base AS ($src),
       |ranked AS (
       |  SELECT x, y,
       |         (rank() OVER (ORDER BY x) - 1) * $nBuckets // count(*) OVER () AS xb,
       |         (rank() OVER (ORDER BY y) - 1) * $nBuckets // count(*) OVER () AS yb,
       |         count(*) OVER () AS n_total
       |  FROM base
       |), keyed AS (
       |  SELECT x, y, n_total,
       |         ${zorderKeySql(dimBits)} AS z_key,
       |         yb * $nBuckets + xb AS lex_key
       |  FROM ranked
       |), fid AS (
       |  SELECT 'zorder' AS layout, x, y,
       |         (rank() OVER (ORDER BY z_key) - 1) * $nFiles // n_total AS file_id
       |  FROM keyed
       |  UNION ALL
       |  SELECT 'linear' AS layout, x, y,
       |         (rank() OVER (ORDER BY lex_key) - 1) * $nFiles // n_total AS file_id
       |  FROM keyed
       |)
       |SELECT layout,
       |       count(DISTINCT file_id) AS n_files,
       |       CAST(sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |       CAST(sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
       |                THEN x END) AS BIGINT) AS sum_x,
       |       CAST(sum(CASE WHEN x BETWEEN $xLo AND $xHi AND y BETWEEN $yLo AND $yHi
       |                THEN y END) AS BIGINT) AS sum_y
       |FROM fid GROUP BY layout ORDER BY layout""".stripMargin
  }

  // ── Bloom-filter manifest: point-lookup skipping where zone maps fail ──
  //
  // A min/max manifest prunes RANGE predicates over clustered columns; it
  // is useless for point lookups of a high-cardinality key in a layout the
  // key is NOT clustered by (hash-scattered ingest, unordered arrival):
  // every file's [min, max] spans nearly the whole key domain, so nothing
  // skips. The per-file BLOOM manifest is the standard answer (Parquet
  // bloom filters, Iceberg puffin blobs): a compact membership summary per
  // file, probed at scan-planning time, false positives allowed (extra
  // files read), false negatives impossible (no data missed).
  //
  // The filter here is represented RELATIONALLY — (file_id, bit) rows, one
  // per set bit — rather than as a binary blob: semantically identical
  // (the blob is exactly the set of set bits), mergeable by set union,
  // bounded by m rows per file, and probe-able with a plain join, so the
  // whole structure round-trips through any table format and the DuckDB
  // oracle replays build + probe bitwise from the same md5 arithmetic.

  /** Bit position `j` (1-based hash index) of `id` in an `m`-bit filter —
    * md5-derived, exact integer, engine-portable.
    */
  def bloomBit(id: Column, j: Int, m: Long): Column =
    pmod(
      conv(substring(md5(concat(id.cast("string"), lit(s"#b$j"))), 1, 8), 16, 10)
        .cast("long"),
      lit(m))

  /** Build the manifest: the distinct set bits of every file's id set.
    * One explode + distinct, ≤ `m` rows per file regardless of row count.
    */
  def bloomManifest(files: DataFrame, id: Column, fileId: Column, m: Long, k: Int): DataFrame = {
    require(k >= 1 && m >= 2, s"need k >= 1 hashes and m >= 2 bits, got k=$k m=$m")
    files
      .select(
        fileId.as("file_id"),
        explode(array((1 to k).map(j => bloomBit(id, j, m)): _*)).as("bit"))
      .distinct()
  }

  /** Scan-planning probe: `(probe_id, file_id)` pairs where the file's
    * filter contains ALL of the probe's bits — the candidate files a point
    * lookup must read. Never misses a file that truly holds the probe (a
    * present id contributed exactly these bits to its file's manifest);
    * may keep extra files at the filter's false-positive rate. The probe
    * side is broadcast — it is query-literal-sized.
    */
  def bloomCandidates(
      manifest: DataFrame, probes: DataFrame, probeId: String, m: Long, k: Int): DataFrame = {
    val pb = probes
      .select(
        col(probeId).as("probe_id"),
        explode(array((1 to k).map(j => bloomBit(col(probeId), j, m)): _*)).as("bit"))
      .distinct()
    val nb = pb.groupBy(col("probe_id")).agg(count(lit(1)).as("nb"))
    manifest
      .join(broadcast(pb), Seq("bit"))
      .groupBy(col("probe_id"), col("file_id"))
      .agg(count(lit(1)).as("hits"))
      .join(broadcast(nb), Seq("probe_id"))
      .where(col("hits") === col("nb"))
      .select(col("probe_id"), col("file_id"))
  }
}
