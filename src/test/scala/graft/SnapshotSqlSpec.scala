package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftCatalog, SnapshotLog}

/** DSv2 SQL addressability of snapshot-log tables ([[GraftCatalog]]):
  * `SELECT … FROM graftsnap.t` with `VERSION AS OF` / `TIMESTAMP AS OF`
  * riding Spark's native time-travel syntax into the log's pinned reads.
  */
class SnapshotSqlSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val root = "/root/repo/target/snapsql_spec"

  private def freshLog(name: String): SnapshotLog = {
    val log = new SnapshotLog(s"$root/$name")
    log.recreate()
    log
  }

  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graftsnap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsnap.root", root)
  }

  test("SQL reads the current snapshot through a V2 scan with pushdown; writes refuse") {
    val log = freshLog("t_sql")
    log.append((0 until 20).map(i => (i.toLong, s"p-$i", i.toLong * 10))
      .toDF("id", "payload", "v"), partitions = 2)
    registerCatalog()
    val out = spark.sql(
      "SELECT count(*) AS n, sum(v) AS sv FROM graftsnap.t_sql WHERE id >= 10").head()
    assert(out.getLong(0) == 10L && out.getLong(1) == (10 until 20).map(_ * 10L).sum)
    // the plan is a DSv2 BatchScan with the filter PUSHED to parquet
    val df = spark.sql("SELECT id, v FROM graftsnap.t_sql WHERE id >= 10")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected a V2 BatchScan, got:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,10)]") ||
      plan.contains("GreaterThanOrEqual(id,10)"), s"filter not pushed:\n$plan")
    // column pruning reaches the scan: only the selected columns are read
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"projection not pruned to (id, v):\n$plan")
    // transactional INSERT: one atomic manifest commit through appendStrict
    val vBefore = log.currentVersion.get
    spark.sql("INSERT INTO graftsnap.t_sql VALUES (99, 'x', 990)")
    assert(log.currentVersion.get == vBefore + 1L, "INSERT is exactly one commit")
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_sql").head().getLong(0) == 21L)
    assert(log.read(spark, log.currentVersion.get)
      .where(col("id") === 99L).count() == 1L, "the API read sees the SQL insert")
    // INSERT OVERWRITE refuses — an untracked overwrite would bypass the log
    val ex = intercept[Exception] {
      spark.sql("INSERT OVERWRITE TABLE graftsnap.t_sql VALUES (1, 'y', 10)")
    }
    // under partitionOverwriteMode=dynamic the analyzer refuses before the
    // V1 path (no OVERWRITE_DYNAMIC capability); under static, the V1
    // insert refuses with the catalog's own message — both are loud
    assert(ex.getMessage.contains("INSERT OVERWRITE is not supported") ||
      ex.getMessage.contains("does not support dynamic overwrite") ||
      ex.getMessage.contains("TABLE_OPERATION"),
      s"unexpected: ${ex.getMessage}")
  }

  test("VERSION AS OF and TIMESTAMP AS OF pin historical snapshots; snapshot isolation holds") {
    val log = freshLog("t_travel")
    log.append((0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    val t0 = log.commitTimeMillis(log.currentVersion.get)
    // ensure a strictly later mtime for the second commit
    Thread.sleep(1100)
    log.append((10 until 25).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    registerCatalog()
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_travel").head().getLong(0) == 25L)
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_travel VERSION AS OF 0")
      .head().getLong(0) == 10L)
    val ts = new java.sql.Timestamp(t0).toString
    assert(spark.sql(s"SELECT count(*) AS n FROM graftsnap.t_travel TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 10L)
    // a missing version refuses loudly
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graftsnap.t_travel VERSION AS OF 99").collect()
    }
    assert(ex.getMessage.contains("does not exist"), s"unexpected: ${ex.getMessage}")
    // snapshot isolation: a table loaded BEFORE a new commit keeps reading
    // its own file listing
    val pinned = spark.sql("SELECT count(*) AS n FROM graftsnap.t_travel")
    log.append(Seq((100L, 100L)).toDF("id", "v"), partitions = 1)
    assert(pinned.head().getLong(0) == 25L, "loaded table must not see the later commit")
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_travel").head().getLong(0) == 26L)
  }

  test("masked or mapped snapshots refuse a raw SQL scan loudly; listTables sees the pool") {
    val log = freshLog("t_masked")
    log.append((0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    log.deleteWhere(spark, col("id") === 3L)
    registerCatalog()
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graftsnap.t_masked").collect()
    }
    assert(ex.getMessage.contains("merge-on-read masks"), s"unexpected: ${ex.getMessage}")
    // compact() clears the masks and SQL works again — the documented remediation
    log.compact(spark, partitions = 1)
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_masked").head().getLong(0) == 9L)
    val names = spark.sql("SHOW TABLES IN graftsnap").collect().map(_.getString(1)).toSet
    assert(Set("t_sql", "t_travel", "t_masked").subsetOf(names), s"got $names")
  }

  test("SQL DELETE routes through the copy-on-write delete; the table stays scan-clean") {
    val log = freshLog("t_del")
    val vA = log.append((0 until 20).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    val fileA = log.dataFiles(vA).head
    log.append((20 until 40).map(i => (i.toLong, i.toLong)).toDF("id", "v"), partitions = 1)
    registerCatalog()
    val vBefore = log.currentVersion.get
    spark.sql("DELETE FROM graftsnap.t_del WHERE id < 5 OR id = 30")
    assert(log.currentVersion.get == vBefore + 1L, "DELETE is exactly one commit")
    assert(log.posDeleteFiles(log.currentVersion.get).isEmpty &&
      log.dvFiles(log.currentVersion.get).isEmpty, "copy-on-write leaves no masks")
    // the SQL read keeps working immediately — no compact step
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_del").head().getLong(0) == 34L)
    assert(spark.sql("SELECT count(*) AS n FROM graftsnap.t_del WHERE id < 5 OR id = 30")
      .head().getLong(0) == 0L)
    assert(!log.dataFiles(log.currentVersion.get).contains(fileA), "grazed file rewritten")
  }
}
