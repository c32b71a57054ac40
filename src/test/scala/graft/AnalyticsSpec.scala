package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  // Mondays: 2024-01-01, -08, -15 — week-truncation anchors
  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_s", "event_type")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
  }

  test("retentionCohorts: first week anchors the cohort, offsets count weeks") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"), // A: weeks 0,1,2
      (1L, "2024-01-09 10:00:00", "view"),
      (1L, "2024-01-16 10:00:00", "view"),
      (2L, "2024-01-02 10:00:00", "view"), // B: weeks 0,2
      (2L, "2024-01-17 10:00:00", "view"),
      (3L, "2024-01-10 10:00:00", "view")) // C: week 1 only
    val got = Analytics.retentionCohorts(events, "user_id", org.apache.spark.sql.functions.col("ts"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1000000L), // A+B
      ("2024-01-01", 1L, 1L, 2L, 500000L), // A only
      ("2024-01-01", 2L, 2L, 2L, 1000000L), // A+B again
      ("2024-01-08", 0L, 1L, 1L, 1000000L))) // C's own cohort
  }

  test("funnelSteps: order matters, same-second chains, dropouts counted once") {
    val events = ev(
      // u1 completes view→click→purchase in order
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      // u2 clicks BEFORE any view — click precedes reach, so step 2 not hit
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 11:00:00", "view"),
      // u3 views then clicks in the SAME second (>= chains), no purchase
      (3L, "2024-01-01 12:00:00", "view"),
      (3L, "2024-01-01 12:00:00", "click"),
      // u4 purchases without viewing — contributes to no step
      (4L, "2024-01-01 13:00:00", "purchase"))
    val got = Analytics.funnelSteps(
      events, "user_id", org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("event_type"),
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "view", 3L, 1000000L), // u1, u2, u3
      (2L, "click", 2L, 666666L), // u1, u3 (u2's click was too early)
      (3L, "purchase", 1L, 333333L))) // u1 only
  }

  test("funnelSteps: empty step yields a zero row, not a missing row") {
    val events = ev((1L, "2024-01-01 10:00:00", "view"))
    val got = Analytics.funnelSteps(
      events, "user_id", org.apache.spark.sql.functions.col("ts"),
      org.apache.spark.sql.functions.col("event_type"),
      Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 1000000L), (2L, 0L, 0L)))
  }

  test("resampleDaily: gap days materialize, purchase value carries across them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val events = Seq(
      // u1: purchase 5.0 on day 1, nothing on day 2, view on day 3,
      //     purchase 9.0 then view on day 4 (carry updates within the day)
      (1L, 1L, "2024-01-01 10:00:00", "purchase", 5.0),
      (2L, 1L, "2024-01-03 10:00:00", "view", 0.0),
      (3L, 1L, "2024-01-04 09:00:00", "purchase", 9.0),
      (4L, 1L, "2024-01-04 11:00:00", "view", 0.0),
      // u2: never purchases — carry stays NULL throughout
      (5L, 2L, "2024-01-02 10:00:00", "view", 0.0))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value")
      .selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts",
        "event_type", "value")
    val got = Analytics.resampleDaily(events, "user_id", col("ts"), "2024-01-01", "2024-01-04")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 1L, Some(5.0), false),
      (1L, "2024-01-02", 0L, Some(5.0), true), // gap day exists, value carried
      (1L, "2024-01-03", 1L, Some(5.0), false), // view day keeps the carry
      (1L, "2024-01-04", 2L, Some(9.0), false), // end-of-day carry, not mid-day
      (2L, "2024-01-01", 0L, None, true), // before first activity: gap, no carry
      (2L, "2024-01-02", 1L, None, false),
      (2L, "2024-01-03", 0L, None, true),
      (2L, "2024-01-04", 0L, None, true)))
  }
}
