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
}
