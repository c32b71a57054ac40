package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ids

class IdsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n).selectExpr("id AS doc_id", "concat('text-', id % 97) AS text")

  test("ids are the exact global row_number order, at any partitioning") {
    val df = docs(1000)
    val single = df
      .withColumn("new_id",
        row_number().over(Window.orderBy(md5(col("text")), col("doc_id"))) - 1)
      .select(col("doc_id"), col("new_id"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    Seq(1, 7).foreach { p =>
      val got = Ids.assignStableIds(df.repartition(p), col("text"), col("doc_id"))
        .select(col("doc_id"), col("new_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == single, s"partitioning $p changed the assignment")
    }
  }

  test("ids are invariant across prefix widths — the width splits work, never reorders it") {
    val df = docs(1000)
    val baseline = Ids.assignStableIds(df, col("text"), col("doc_id"), hexPrefixLen = 1)
      .select(col("doc_id"), col("new_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(2, 3, 4, 5).foreach { w =>
      val got = Ids.assignStableIds(df, col("text"), col("doc_id"), hexPrefixLen = w)
        .select(col("doc_id"), col("new_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == baseline, s"hexPrefixLen=$w changed the assignment")
    }
    // the auto-derived width (default) is one of those same assignments
    val auto = Ids.assignStableIds(df, col("text"), col("doc_id"))
      .select(col("doc_id"), col("new_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == baseline)
  }

  test("auto width bounds per-bucket sort work by the row-count target") {
    // the derived width is the smallest whose uniform buckets fit the target
    assert(Ids.prefixLenFor(0L) == 1)
    assert(Ids.prefixLenFor(Ids.TargetRowsPerBucket * 16 - 1) == 1)
    assert(Ids.prefixLenFor(Ids.TargetRowsPerBucket * 16) == 2)
    assert(Ids.prefixLenFor(Ids.TargetRowsPerBucket * 256) == 3)
    assert(Ids.prefixLenFor(Long.MaxValue) == 8) // clamps at the 8-hex decode
    // bound law: n / 16^p < target for every n the width ladder covers
    for (n <- Seq(1L, 1000L, 100L * 1000 * 1000, 10L * 1000 * 1000 * 1000)) {
      val p = Ids.prefixLenFor(n)
      assert(p == 8 || n / math.pow(16, p).toLong < Ids.TargetRowsPerBucket,
        s"n=$n p=$p leaves oversized buckets")
    }
    // tighter targets widen the prefix
    assert(Ids.prefixLenFor(1000L, targetRowsPerBucket = 10L) == 2)
  }

  test("ids are dense 0..n-1 with no gaps or duplicates") {
    val ids = Ids.assignStableIds(docs(257), col("text"), col("doc_id"))
      .select("new_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 257L))
  }

  test("null keys hash like the empty string — no row is silently dropped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a"), Row(2L, null), Row(3L, null)),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true))))
    val got = Ids.assignStableIds(df, col("text"), col("doc_id"))
      .select("new_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(0L, 1L, 2L))
  }

  test("ties on the hash key fall back to the tiebreak deterministically") {
    // identical text → identical md5; doc_id must decide
    val df = Seq((5L, "same"), (3L, "same"), (9L, "same"))
      .toDF("doc_id", "text")
    val got = Ids.assignStableIds(df, col("text"), col("doc_id"))
      .orderBy(col("new_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == Seq((3L, 0L), (5L, 1L), (9L, 2L)))
  }
}
