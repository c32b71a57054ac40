package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotLog
import graft.streaming.StreamingCdc

/** The native `graft-log` streaming source
  * ([[graft.sources.GraftLogSourceProvider]]): snapshot-log commits as
  * micro-batches with VERSION-valued offsets — checkpoint-recoverable,
  * append-contract-enforcing, zero staging.
  */
class GraftLogSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val root = "/root/repo/target/logsource_spec"

  private def freshLog(name: String): SnapshotLog = {
    val log = new SnapshotLog(s"$root/$name")
    log.recreate()
    log
  }

  test("commits stream in version order; a mid-stream commit is a new micro-batch") {
    val log = freshLog("t_src")
    log.append((0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    log.append((10 until 25).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    val q = spark.readStream
      .format("graft-log").option("root", log.root).load()
      .writeStream.format("memory").queryName("logsrc_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("logsrc_mem").count() == 25L)
      // a commit landing while the query runs arrives as its own batch
      log.append(Seq((100L, 100L)).toDF("id", "v"), partitions = 1)
      q.processAllAvailable()
      assert(spark.table("logsrc_mem").count() == 26L)
      assert(spark.table("logsrc_mem").where(col("id") === 100L).count() == 1L)
      // offsets advanced to the log's current version
      assert(q.lastProgress.sources.head.endOffset.trim.toLong ==
        log.currentVersion.get)
    } finally q.stop()
  }

  test("startingVersion skips history; missing root/version refuse loudly") {
    val log = freshLog("t_from")
    log.append((0 until 10).map(i => (i.toLong, 0L)).toDF("id", "v"), partitions = 1)
    log.append((10 until 15).map(i => (i.toLong, 1L)).toDF("id", "v"), partitions = 1)
    val q = spark.readStream
      .format("graft-log").option("root", log.root)
      .option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("logsrc_from")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // only v1's appended files stream — v0's ten rows never enter
      assert(spark.table("logsrc_from").count() == 5L)
    } finally q.stop()
    val ex = intercept[Exception] {
      spark.readStream.format("graft-log")
        .option("root", s"$root/nope").load()
    }
    assert(ex.getMessage.contains("no committed snapshot"), s"got: ${ex.getMessage}")
  }

  test("a rewrite commit mid-stream fails the append contract loudly") {
    val log = freshLog("t_rw")
    log.append((0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    val q = spark.readStream
      .format("graft-log").option("root", log.root).load()
      .writeStream.format("memory").queryName("logsrc_rw")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      log.compact(spark, partitions = 1) // removes files — not an append
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(ex.getMessage.contains("rewrite") ||
        Option(ex.getCause).exists(_.getMessage.contains("rewrite")),
        s"got: ${ex.getMessage}")
    } finally q.stop()
  }

  test("readChangeFeed streams row-level changes through DML the append mode refuses") {
    val log = freshLog("t_cdf")
    log.append((0 until 10).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v"), partitions = 1)
    val q = spark.readStream
      .format("graft-log").option("root", log.root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("logsrc_cdf")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val initial = spark.table("logsrc_cdf")
      assert(initial.count() == 10L &&
        initial.where(col("_change_type") === "insert").count() == 10L)
      // a merge-on-read DELETE arrives as delete pre-images, not an error
      log.deleteWhere(spark, col("id") < 3L)
      q.processAllAvailable()
      val dels = spark.table("logsrc_cdf").where(col("_change_type") === "delete")
      assert(dels.count() == 3L &&
        dels.agg(sum(col("id"))).head().getLong(0) == 3L)
      // an UPDATE is a delete+insert pair under ONE commit version
      log.updateWhere(spark, col("id") === 5L, Seq("v" -> lit(999L)))
      q.processAllAvailable()
      val vUpd = log.currentVersion.get
      val upd = spark.table("logsrc_cdf").where(col("_commit_version") === vUpd)
      assert(upd.count() == 2L)
      assert(upd.where(col("_change_type") === "insert").head().getLong(1) == 999L)
      // a compact nets to ZERO change rows — reorgs are invisible to the feed
      val before = spark.table("logsrc_cdf").count()
      log.compact(spark, partitions = 1)
      q.processAllAvailable()
      assert(spark.table("logsrc_cdf").count() == before, "reorg leaked changes")
    } finally q.stop()
  }

  test("kill/restart from the checkpoint is exactly-once (the harness's laws hold)") {
    val log = freshLog("t_rec")
    log.append((0 until 20).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "tag"), partitions = 2)
    val out = StreamingCdc.nativeLogSourceReplay(
      log,
      phase2 = Seq(
        (20 until 30).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "tag"),
        (30 until 40).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "tag")),
      partitions = 1,
      aggregate = df => df.groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("id")).cast("long").as("sum_id")))
    val rows = out.orderBy(col("tag")).collect()
    assert(rows.forall(_.getBoolean(3)), "interrupted_midstream must hold")
    assert(rows.forall(_.getBoolean(4)), "no_duplicate_emissions must hold")
    val expected = (0 until 40).groupBy(i => s"s${i % 3}")
      .map { case (t, is) => (t, is.size.toLong, is.map(_.toLong).sum) }
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      expected.toSet)
  }
}
