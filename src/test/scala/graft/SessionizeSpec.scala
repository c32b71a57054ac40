package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite {

  test("session boundaries agree with Spark's native session_window aggregation") {
    import SparkTestSession._
    import org.apache.spark.sql.functions._
    // independent implementation of the same 300 s-gap semantics: Spark's
    // session_window closes a session when the next event is >= gap after the
    // last — cross-validating our window-based sessionize against the
    // built-in (ids differ; compare (user, start_sec, n_events) triples)
    val ev = Tables.events(spark, SfDir)
    val ours = Sessionize.sessionize(ev)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("epoch_sec")).as("start_sec"), count(lit(1)).as("n"))
      .select("user_id", "start_sec", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = ev
      .withColumn("ts_sec", timestamp_seconds(unix_timestamp(col("ts"))))
      .groupBy(col("user_id"), session_window(col("ts_sec"), "300 seconds"))
      .agg(min(unix_timestamp(col("ts_sec"))).as("start_sec"), count(lit(1)).as("n"))
      .select("user_id", "start_sec", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ours == native)
    assert(ours.nonEmpty)
  }
  import SparkTestSession._

  private def events(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("event_id", "user_id", "ts_str")
      .withColumn("ts", to_timestamp(col("ts_str")))
      .drop("ts_str")
  }

  private def sessionsOf(df: DataFrame): Map[Long, String] =
    Sessionize.sessionize(df).select("event_id", "session_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("gap < 300s stays in one session; >= 300s starts a new one (boundary exact)") {
    val df = events(
      (1L, 7L, "2024-01-01 00:00:00"),
      (2L, 7L, "2024-01-01 00:04:59"), // 299s → same session
      (3L, 7L, "2024-01-01 00:09:59")) // 300s → NEW session (>= rule)
    val s = sessionsOf(df)
    assert(s(1L) == s(2L))
    assert(s(2L) != s(3L))
  }

  test("gap computed on whole-second truncation like the reference (F4)") {
    // 00:00:00.900 → 00:04:59.100: real gap 298.2s; truncated 299 - 0 = 299 → same
    // 00:04:59.100 → 00:09:59.900: real gap 300.8s; truncated 599-299 = 300 → new
    val df = events(
      (1L, 7L, "2024-01-01 00:00:00.9"),
      (2L, 7L, "2024-01-01 00:04:59.1"),
      (3L, 7L, "2024-01-01 00:09:59.9"))
    val s = sessionsOf(df)
    assert(s(1L) == s(2L))
    assert(s(3L) != s(2L))
  }

  test("first event of every user starts a session; ids unique per (user, start)") {
    val df = events(
      (1L, 1L, "2024-01-01 00:00:00"),
      (2L, 2L, "2024-01-01 00:00:00"),
      (3L, 1L, "2024-01-01 01:00:00"))
    val out = Sessionize.sessionize(df)
    assert(out.where(col("is_new_session")).count() == 3)
    assert(out.select("session_id").distinct().count() == 3)
  }

  test("split-invariance: sessionize(batch1) + continuity(batch2) == sessionize(whole), any cut") {
    val whole = Tables.events(spark, SfDir)
    val full = Sessionize.sessionize(whole)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    for (cutStr <- Seq("2024-01-05 12:34:56", "2024-01-16 00:00:00", "2024-01-28 03:00:00")) {
      val cut = to_timestamp(lit(cutStr))
      val b1 = Sessionize.sessionize(whole.where(col("ts") < cut))
      val tail = b1.where(unix_timestamp(col("ts")) >= unix_timestamp(cut) - 300)
      val b2 = Sessionize.sessionizeWithContinuity(whole.where(col("ts") >= cut), tail)
      val split = (b1.select("event_id", "session_id").collect() ++
        b2.select("event_id", "session_id").collect())
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(split == full, s"cut at $cutStr diverged")
    }
  }

  test("continuity: within-gap first event inherits the open session, beyond-gap does not") {
    val b1 = Sessionize.sessionize(events((1L, 7L, "2024-01-01 00:00:00")))
    // within 300s of last existing event → inherits
    val cont = Sessionize.sessionizeWithContinuity(
      events((2L, 7L, "2024-01-01 00:04:00")), b1)
    assert(cont.select("session_id").head().getString(0) ==
      b1.select("session_id").head().getString(0))
    assert(!cont.select("is_new_session").head().getBoolean(0))
    // at exactly 300s → new session
    val fresh = Sessionize.sessionizeWithContinuity(
      events((3L, 7L, "2024-01-01 00:05:00")), b1)
    assert(fresh.select("session_id").head().getString(0) !=
      b1.select("session_id").head().getString(0))
  }

  test("sessionPaths: in-row sort orders same-second events by id; top-k tiebreak total") {
    import spark.implicits._
    // u1 session: view,click in the SAME second (id order decides),
    // then a second session after the gap: view alone
    // u2 session: view>click — same path as u1's first session
    val ev = Seq(
      (2L, 1L, "2024-01-01 10:00:00", "click"),
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (3L, 1L, "2024-01-01 11:00:00", "view"),
      (4L, 2L, "2024-01-01 09:00:00", "view"),
      (5L, 2L, "2024-01-01 09:00:30", "click"))
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .selectExpr(
        "event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    val got = Sessionize.sessionPaths(ev, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view>click", 2L), ("view", 1L)))
  }
}
