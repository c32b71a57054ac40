package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {
  import SparkTestSession._

  private def base = {
    import spark.implicits._
    Seq(
      (1L, "a", 10.0),
      (2L, "b", 20.0),
      (3L, "c", 30.0)).toDF("k", "s", "v")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

  test("update/delete/insert in one merge; untouched rows pass through") {
    import spark.implicits._
    val changes = Seq(
      (2L, "B", 22.0, "u"),
      (3L, "c", 30.0, "d"),
      (9L, "z", 90.0, "i")).toDF("k", "s", "v", "op")
    val got = collect(Cdc.applyChanges(base, changes, Seq("k")))
    assert(got == Set(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("B"), Some(22.0)),
      (9L, Some("z"), Some(90.0))))
  }

  test("full-row-image semantics: an update CAN set a column to NULL") {
    import spark.implicits._
    val changes = Seq((1L, null.asInstanceOf[String], Some(11.0), "u"))
      .toDF("k", "s", "v", "op")
    val got = collect(Cdc.applyChanges(base, changes, Seq("k")))
    assert(got.contains((1L, None, Some(11.0))),
      s"update must overwrite with its full image including NULLs, got $got")
  }

  test("upsert: an update for an absent key inserts; a delete for an absent key is a no-op") {
    import spark.implicits._
    val changes = Seq((7L, "new", 70.0, "u"), (8L, "x", 80.0, "d")).toDF("k", "s", "v", "op")
    val got = collect(Cdc.applyChanges(base, changes, Seq("k")))
    assert(got.contains((7L, Some("new"), Some(70.0))))
    assert(!got.exists(_._1 == 8L))
    assert(got.size == 4) // 3 base + 1 upsert
  }

  test("a non-compacted feed (two change rows for one key) fails loudly by default") {
    import spark.implicits._
    val changes = Seq((2L, "B", 22.0, "u"), (2L, "BB", 23.0, "u")).toDF("k", "s", "v", "op")
    val e = intercept[Exception] {
      Cdc.applyChanges(base, changes, Seq("k")).collect()
    }
    assert(e.getMessage.contains("multiple change rows")
      || Option(e.getCause).exists(_.getMessage.contains("multiple change rows")))
    // opt-out for feeds compacted upstream by construction: no guard, the
    // documented join-order hazard is the caller's accepted trade
    val got = Cdc.applyChanges(base, changes, Seq("k"), validate = false).collect()
    assert(got.length == 4, "without validation both images survive the join")
  }

  test("pruned merge: returns only touched partitions' merged rows; new partitions insert") {
    import spark.implicits._
    val base = Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0),
      (3L, "p2", 30.0), (4L, "p2", 40.0),
      (5L, "p3", 50.0)).toDF("k", "part", "v")
    val changes = Seq(
      (2L, "p1", 22.0, "u"),   // update in p1
      (1L, "p1", 10.0, "d"),   // delete in p1
      (9L, "p9", 90.0, "i")    // insert into a BRAND-NEW partition
    ).toDF("k", "part", "v", "op")
    val got = Cdc.applyChangesPruned(base, changes, Seq("k"), Seq("part"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // p2/p3 rows are NOT in the output — they are the partitions a dynamic
    // overwrite would leave untouched on disk
    assert(got == Set((2L, "p1", 22.0), (9L, "p9", 90.0)))
  }

  test("pruned merge: width guard falls back to a semi-join restriction with identical output") {
    import spark.implicits._
    val base = Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0),
      (3L, "p2", 30.0), (4L, "p2", 40.0),
      (5L, "p3", 50.0)).toDF("k", "part", "v")
    val changes = Seq(
      (2L, "p1", 22.0, "u"), (3L, "p2", 30.0, "d"), (9L, "p9", 90.0, "i"))
      .toDF("k", "part", "v", "op")
    def run(threshold: Int) =
      Cdc.applyChangesPruned(base, changes, Seq("k"), Seq("part"),
        maxLiteralPartitions = threshold)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = Set((1L, "p1", 10.0), (2L, "p1", 22.0), (4L, "p2", 40.0), (9L, "p9", 90.0))
    assert(run(4096) == expected, "literal-predicate route")
    // 3 touched partitions > threshold 1 → broadcast-semi-join route; the
    // untouched-partition row (5, p3) must STILL be excluded
    assert(run(1) == expected, "semi-join fallback route")
  }

  test("pruned merge: key and partition columns must not overlap; empty batch fails loudly") {
    import spark.implicits._
    val base = Seq((1L, "p1", 10.0)).toDF("k", "part", "v")
    intercept[IllegalArgumentException] {
      Cdc.applyChangesPruned(base, base.withColumn("op", lit("u")), Seq("k", "part"), Seq("part"))
    }
    val empty = Seq.empty[(Long, String, Double, String)].toDF("k", "part", "v", "op")
    intercept[IllegalArgumentException] {
      Cdc.applyChangesPruned(base, empty, Seq("k"), Seq("part"))
    }
  }

  test("an unknown op fails the job loudly instead of passing rows through") {
    import spark.implicits._
    val changes = Seq((2L, "b", 20.0, "x")).toDF("k", "s", "v", "op")
    val e = intercept[Exception] {
      Cdc.applyChanges(base, changes, Seq("k")).collect()
    }
    assert(e.getMessage != null)
  }

  test("idempotence: applying the same change batch twice yields the same state") {
    import spark.implicits._
    val changes = Seq((2L, "B", 22.0, "u"), (3L, "c", 30.0, "d")).toDF("k", "s", "v", "op")
    val once = Cdc.applyChanges(base, changes, Seq("k"))
    val twice = Cdc.applyChanges(once, changes, Seq("k"))
    assert(collect(once) == collect(twice))
  }

  private def collectScd2(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0), Option(r.getString(1)),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))
    }.toSet // (k, s, valid_from, valid_to, is_current)

  test("scd2: updates version, deletes close, inserts open, untouched stay current") {
    import spark.implicits._
    val hist = Cdc.scd2Init(base, 1L)
    val changes = Seq(
      (2L, "B", 22.0, "u"),
      (3L, "c", 30.0, "d"),
      (9L, "z", 90.0, "i")).toDF("k", "s", "v", "op")
    val got = collectScd2(Cdc.applyChangesScd2(hist, changes, Seq("k"), 2L))
    assert(got == Set(
      (1L, Some("a"), 1L, None, true), // untouched: still current from 1
      (2L, Some("b"), 1L, Some(2L), false), // closed old version
      (2L, Some("B"), 2L, None, true), // opened new version
      (3L, Some("c"), 1L, Some(2L), false), // deleted: closed, no successor
      (9L, Some("z"), 2L, None, true))) // insert opens at 2
  }

  test("scd2: history accrues across batches; closed rows never change again") {
    import spark.implicits._
    val hist1 = Cdc.applyChangesScd2(
      Cdc.scd2Init(base, 1L),
      Seq((2L, "B", 22.0, "u")).toDF("k", "s", "v", "op"), Seq("k"), 2L)
    val hist2 = Cdc.applyChangesScd2(
      hist1,
      Seq((2L, "BB", 23.0, "u"), (1L, "a", 10.0, "d")).toDF("k", "s", "v", "op"),
      Seq("k"), 3L)
    val got = collectScd2(hist2)
    assert(got == Set(
      (1L, Some("a"), 1L, Some(3L), false),
      (2L, Some("b"), 1L, Some(2L), false), // untouched by batch 3
      (2L, Some("B"), 2L, Some(3L), false),
      (2L, Some("BB"), 3L, None, true),
      (3L, Some("c"), 1L, None, true)))
    // exactly one current version per live key
    val currents = got.filter(_._5).groupBy(_._1).map { case (k, vs) => k -> vs.size }
    assert(currents.values.forall(_ == 1))
  }

  test("scd2: delete of an absent key is a no-op; upsert for an absent key opens") {
    import spark.implicits._
    val changes = Seq((8L, "x", 80.0, "d"), (7L, "new", 70.0, "u")).toDF("k", "s", "v", "op")
    val got = collectScd2(Cdc.applyChangesScd2(Cdc.scd2Init(base, 1L), changes, Seq("k"), 2L))
    assert(!got.exists(_._1 == 8L))
    assert(got.contains((7L, Some("new"), 2L, None, true)))
    assert(got.size == 4) // 3 carried + 1 opened
  }

  test("scd2: non-compacted feed fails loudly by default") {
    import spark.implicits._
    val changes = Seq((2L, "B", 22.0, "u"), (2L, "BB", 23.0, "u")).toDF("k", "s", "v", "op")
    val e = intercept[Exception] {
      Cdc.applyChangesScd2(Cdc.scd2Init(base, 1L), changes, Seq("k"), 2L).collect()
    }
    assert(e.getMessage.contains("multiple change rows")
      || Option(e.getCause).exists(_.getMessage.contains("multiple change rows")))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged with key-sum pins") {
    import spark.implicits._
    val oldV = Seq(
      (1L, Some("a"), 10L), // unchanged
      (2L, Some("b"), 20L), // changed (value)
      (3L, None, 30L), // changed: NULL -> empty string must NOT look equal
      (4L, Some("d"), 40L)) // removed
      .toDF("k", "s", "v")
    val newV = Seq(
      (1L, Some("a"), 10L),
      (2L, Some("B"), 20L),
      (3L, Some(""), 30L),
      (5L, Some("e"), 50L)) // added
      .toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(oldV, newV, "k", Seq("s", "v"))
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("sum_key"))))
      .toMap
    assert(got == Map(
      "added" -> ((1L, 5L)),
      "removed" -> ((1L, 4L)),
      "changed" -> ((2L, 2L + 3L)),
      "unchanged" -> ((1L, 1L))))
  }

  test("snapshotDiff of a version against itself is all-unchanged") {
    val got = Cdc.snapshotDiff(base, base, "k", Seq("s", "v")).collect()
    assert(got.length == 1 && got.head.getString(0) == "unchanged")
  }

  test("scd2Lookup: each fact sees the version valid at its seq; pre-epoch facts drop") {
    import spark.implicits._
    val dim = Seq((7L, "OLD")).toDF("k", "seg")
    val hist = Cdc.applyChangesScd2(
      Cdc.scd2Init(dim, 10L),
      Seq((7L, "NEW", "u")).toDF("k", "seg", "op"),
      Seq("k"), 20L)
    val facts = Seq(
      (1L, 7L, 5L), // before the first version → drops (inner semantics)
      (2L, 7L, 10L), // at v1 open → OLD
      (3L, 7L, 19L), // just before the upgrade → OLD
      (4L, 7L, 20L), // at the upgrade seq → NEW (valid_to is exclusive)
      (5L, 7L, 99L), // far future → still-current NEW
      (6L, 8L, 10L)) // unknown key → drops
      .toDF("fid", "k", "seq")
    val got = Cdc.scd2Lookup(facts, hist, Seq("k"), Seq("k"), col("seq"))
      .select(col("fid"), col("seg"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "OLD", 3L -> "OLD", 4L -> "NEW", 5L -> "NEW"))
  }

  test("scd2Lookup: colliding column names come back suffixed _dim") {
    import spark.implicits._
    val hist = Cdc.scd2Init(Seq((1L, "x")).toDF("k", "seg"), 1L)
    val facts = Seq((9L, 1L, "facty", 5L)).toDF("fid", "k", "seg", "seq")
    val row = Cdc.scd2Lookup(facts, hist, Seq("k"), Seq("k"), col("seq")).head()
    assert(row.getAs[String]("seg") == "facty")
    assert(row.getAs[String]("seg_dim") == "x")
  }
}
