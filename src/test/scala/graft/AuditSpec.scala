package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audit

class AuditSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fkOrphans counts missing parents AND null keys; clean data scores 0") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None, Some(1L)).toDF("fk")
    val r = Audit.fkOrphans("fk_t", child, "fk", parent, "pk").collect().head
    assert(r.getString(0) == "fk_t")
    assert(r.getAs[Long]("n_checked") == 5L)
    assert(r.getAs[Long]("n_violations") == 2L) // the 9L orphan + the null
    val clean = Audit.fkOrphans("fk_c",
      Seq(Some(1L), Some(2L)).toDF("fk"), "fk", parent, "pk").collect().head
    assert(clean.getAs[Long]("n_violations") == 0L)
  }

  test("dupPrimaryKeys counts extra copies and null keys as violations") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None).toDF("pk")
    val r = Audit.dupPrimaryKeys("pk_t", df, "pk").collect().head
    assert(r.getAs[Long]("n_checked") == 5L)
    // 3 copies of key 1 -> 2 extras; the null row -> 1; key 2 clean
    assert(r.getAs[Long]("n_violations") == 3L)
  }

  test("report unions checks into one ordered relation; empty check list rejected") {
    val parent = Seq(1L).toDF("pk")
    val got = Audit.report(Seq(
      Audit.dupPrimaryKeys("b_pk", parent, "pk"),
      Audit.fkOrphans("a_fk", Seq(1L).toDF("fk"), "fk", parent, "pk")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("a_fk", "b_pk"))
    intercept[IllegalArgumentException](Audit.report(Nil))
  }

  test("the star schema's own keys audit clean at sf0.001") {
    val got = SparkEntry.queries("fk_integrity_audit")(spark, SparkTestSession.SfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(got.size == 5)
    assert(got.values.forall(_ == 0L), s"generator data should be referentially clean: $got")
  }

  private def fpOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    val ser = concat_ws("|", Audit.canonicalField(col("a")), Audit.canonicalField(col("b")))
    Audit.tableFingerprint(df, "t", ser).collect().head match {
      case r => (r.getLong(1), r.getLong(2), r.getLong(3))
    }
  }

  test("tableFingerprint: invariant under row order and partitioning, sensitive to any row edit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1L to 500L).map(i => (i, s"v$i"))
    val base = fpOf(rows.toDF("a", "b"))
    // same multiset, reversed order, different partitioning → identical digest
    assert(fpOf(rows.reverse.toDF("a", "b").repartition(7)) == base)
    // one edited row → both digests move
    val edited = fpOf((rows.init :+ (500L, "vX")).toDF("a", "b"))
    assert(edited._1 == base._1 && edited._2 != base._2 && edited._3 != base._3)
    // one dropped row → count and digests move
    val dropped = fpOf(rows.init.toDF("a", "b"))
    assert(dropped._1 == base._1 - 1 && dropped._2 != base._2)
  }

  test("tableFingerprint: the null sentinel keeps fields positional") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // (a=NULL, b="x") must NOT collide with (a="x", b=NULL) — concat_ws
    // alone would serialize both as "x"
    val left = fpOf(Seq((Option.empty[String], Option("x"))).toDF("a", "b"))
    val right = fpOf(Seq((Option("x"), Option.empty[String])).toDF("a", "b"))
    assert(left != right)
  }
}
