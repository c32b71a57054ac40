package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Naive reference Morton interleave. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorderKey matches the naive bit interleave over the full 6-bit grid") {
    val pairs = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(col("x"), col("y"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 6), s"($x,$y)") }
    // Morton on a full grid is a bijection onto [0, 4096)
    assert(got.map(_._3).toSet == (0L until 4096L).toSet)
  }

  test("scanEfficiency: full-domain predicate scans everything at 1x") {
    val df = (0L until 256L).map(i => (i % 16L, i / 16L)).toDF("x", "y")
    val rows = Layout.scanEfficiency(
      df, col("x"), col("y"), dimBits = 4, fileBits = 3,
      xLo = 0, xHi = 15, yLo = 0, yHi = 15)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 8)
      assert(r.getAs[Long]("files_scanned") == 8)
      assert(r.getAs[Long]("rows_scanned") == 256L)
      assert(r.getAs[Long]("rows_matching") == 256L)
      assert(r.getAs[Long]("amplification_ppm") == 1000000L)
    }
  }

  test("scanEfficiency: box predicate — invariants hold and zorder prunes the 2-D box") {
    // 32x32 grid, one row per cell; box = a quarter in each dimension
    val df = (0L until 1024L).map(i => (i % 32L, i / 32L)).toDF("x", "y")
    val rows = Layout.scanEfficiency(
      df, col("x"), col("y"), dimBits = 5, fileBits = 4,
      xLo = 8, xHi = 15, yLo = 8, yHi = 15)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val z = rows("zorder"); val lin = rows("linear")
    // same rows match regardless of layout
    assert(z.getAs[Long]("rows_matching") == 64L)
    assert(lin.getAs[Long]("rows_matching") == 64L)
    for (r <- Seq(z, lin)) {
      assert(r.getAs[Long]("n_files") == 16L)
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("n_files"))
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"))
      assert(r.getAs[Long]("amplification_ppm") >= 1000000L)
    }
    // on this uniform grid the bucket ids equal the raw coordinates, so the
    // morton layout's 16 equal-count files are aligned 8x8 tiles and the
    // 8x8 predicate box is EXACTLY one tile: 1 file, 64 rows, 1x read.
    assert(z.getAs[Long]("files_scanned") == 1L)
    assert(z.getAs[Long]("rows_scanned") == 64L)
    assert(z.getAs[Long]("amplification_ppm") == 1000000L)
    // the linear layout's files are 2-row y-stripes spanning ALL of x, so
    // the 8-row y-band drags in 4 full stripes = 256 rows for the same 64
    assert(lin.getAs[Long]("files_scanned") == 4L)
    assert(lin.getAs[Long]("rows_scanned") == 256L)
    assert(lin.getAs[Long]("amplification_ppm") == 4000000L)
  }
}
