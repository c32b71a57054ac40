package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

class PrivacySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  // epoch seconds, TZ-proof (Timestamp.valueOf would parse in the JVM zone)
  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val H10 = 1704103200L // 2024-01-01 10:00:00 UTC

  private def fixture = Seq(
    (1L, ts(H10 + 2242), 42L, "click", 1.0, """{"k": 69, "z": 700}"""),
    (2L, ts(H10 + 3599), 42L, "view", 2.0, """{"k": 7}"""),
    (3L, ts(H10 + 3600), 43L, "view", 3.0, "no digits here"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("scrubEvents: redaction + audit count, salted pseudonyms, hour generalization") {
    val got = Privacy.scrubEvents(fixture).orderBy("event_id").collect()

    assert(got.map(_.getAs[Long]("n_redacted")).toSeq == Seq(2L, 1L, 0L))
    assert(got(0).getAs[String]("props_clean") == """{"k": <NUM>, "z": <NUM>}""")
    assert(got(2).getAs[String]("props_clean") == "no digits here")

    // deterministic surrogate: same user → same pseudonym, and exactly the
    // salted md5 (the cross-batch join key contract)
    val p = got.map(_.getAs[String]("user_pseudo"))
    assert(p(0) == p(1) && p(0) != p(2))
    assert(p(0) == md5hex("graft:42"))

    // hour buckets: rows 1–2 share 10:00, row 3 rolls to 11:00; buckets are
    // exact hour marks in integer seconds
    val h = got.map(_.getAs[Long]("ts_hour_sec"))
    assert(h.toSeq == Seq(H10, H10, H10 + 3600))
    assert(h.forall(_ % 3600 == 0))
  }

  test("rotating the salt unlinks every pseudonym at once") {
    val a = Privacy.scrubEvents(fixture, salt = "graft")
      .select("user_pseudo").distinct().collect().map(_.getString(0)).toSet
    val b = Privacy.scrubEvents(fixture, salt = "rotated")
      .select("user_pseudo").distinct().collect().map(_.getString(0)).toSet
    assert(a.intersect(b).isEmpty)
    assert(a.size == 2 && b.size == 2) // same cardinality: joins still work
  }

  test("email / URL patterns redact and count (library surface beyond the events query)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "mail a@b.co or see https://x.example/path now")).toDF("id", "text")
    val r = df.select(
      Privacy.redact(
        Privacy.redact(col("text"), Privacy.UrlPattern, "<URL>"),
        Privacy.EmailPattern, "<EMAIL>").as("clean"),
      Privacy.redactionCount(col("text"), Privacy.EmailPattern).as("ne"),
      Privacy.redactionCount(col("text"), Privacy.UrlPattern).as("nu")).head()
    assert(r.getAs[String]("clean") == "mail <EMAIL> or see <URL> now")
    assert(r.getAs[Long]("ne") == 1L && r.getAs[Long]("nu") == 1L)
  }

  test("forgetUsers: rewrites touched partitions, drops emptied ones as units, idempotent") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_date", DateType, nullable = false)))
    val t = new graft.sources.TableManager("graft_forget_spec", schema, Seq("event_date"))
    t.recreate(spark)
    // day 1: users 1,2; day 2: ONLY user 2 (fully emptied by the purge);
    // day 3: user 3 (untouched — must not be rewritten)
    val rows = Seq(
      (1L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (3L, 2L, "2024-01-02"), (4L, 2L, "2024-01-02"),
      (5L, 3L, "2024-01-03"))
    t.overwritePartitions(spark, rows.toDF("event_id", "user_id", "d")
      .select(col("event_id"), col("user_id"), col("d").cast("date").as("event_date")))
    val subjects = Seq(2L).toDF("user_id")

    val touched = Privacy.forgetUsers(spark, t, "user_id", "event_date", subjects)
    assert(touched == Seq("2024-01-01", "2024-01-02"))
    // day 2 vanished as a partition unit, not as an empty husk
    val parts = spark.sql("SHOW PARTITIONS graft_forget_spec")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(parts == Seq("event_date=2024-01-01", "event_date=2024-01-03"))
    val remaining = t.read(spark).select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(remaining == Seq(1L, 5L))
    // second run: nothing to discover, nothing rewritten
    assert(Privacy.forgetUsers(spark, t, "user_id", "event_date", subjects).isEmpty)
    t.drop(spark)
  }

  test("kAnonymityAudit lists exactly the sub-k classes; suppression fixes them without row loss") {
    import org.apache.spark.sql.functions.col
    // classes: (a,1)x3 compliant at k=3; (a,2)x2 and (b,1)x1 violating
    val df = Seq(
      ("a", 1L, 10L), ("a", 1L, 11L), ("a", 1L, 12L),
      ("a", 2L, 13L), ("a", 2L, 14L),
      ("b", 1L, 15L)).toDF("t", "g", "payload")
    val quasi = Seq("t" -> col("t"), "g" -> col("g"))
    val viol = Privacy.kAnonymityAudit(df, quasi, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viol.toSeq == Seq(("a", 2L, 2L), ("b", 1L, 1L)))
    val anon = Privacy.kAnonymize(df, quasi, k = 3)
    assert(anon.count() == 6L, "suppression must not drop rows")
    val suppressed = anon.where(col("t").isNull && col("g").isNull)
      .select(col("payload")).collect().map(_.getLong(0)).sorted
    assert(suppressed.toSeq == Seq(13L, 14L, 15L))
    // compliant rows untouched; re-audit of the non-suppressed rows is clean
    assert(anon.where(col("t") === "a" && col("g") === 1L).count() == 3L)
    assert(Privacy.kAnonymityAudit(
      anon.where(col("t").isNotNull), Seq("t" -> col("t"), "g" -> col("g")), k = 3)
      .count() == 0L)
  }

  test("dpCounts: seeded geometric noise is deterministic, unclipped, tail-bounded") {
    import org.apache.spark.sql.functions.col
    val df = (0 until 400).map(i => (s"g${i % 40}", i.toLong)).toDF("g", "x")
    def run() = Privacy.dpCounts(df, Seq("g" -> col("g")), seed = "s1")
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "same seed must replay the identical release")
    assert(a.forall { case (_, nTrue, noise, nNoisy, tail) =>
      nTrue == 10L && nNoisy == nTrue + noise && math.abs(noise) <= 16 && tail })
    // a different seed draws different noise somewhere (40 groups —
    // P(all equal) = (sum p^2)^40 ≈ 0.2^40, effectively impossible)
    val c = Privacy.dpCounts(df, Seq("g" -> col("g")), seed = "s2")
      .orderBy(col("g")).collect().map(_.getLong(2))
    assert(!c.sameElements(a.map(_._3)), "seed must drive the draw")
    // the mechanism is unbiased in its support: both signs occur over
    // enough draws (40 groups, P(no negative) ≈ (2/3)^40 < 1e-7)
    assert(a.exists(_._3 > 0) && a.exists(_._3 < 0))
    // CDF thresholds are exact, strictly increasing, and cover 2^32
    val ts = Privacy.DpGeomThresholds
    assert(ts.map(_._2) == ts.map(_._2).sorted && ts.last._2 == (1L << 32))
    assert(ts.map(_._1) == (-16 to 16))
  }

  test("kAnonymize suppresses violating classes whose quasi tuple contains NULL") {
    import org.apache.spark.sql.functions.col
    // (a,1)x3 compliant; (null,2)x2 violating; (b,null)x1 violating — the
    // audit groups NULLs into classes, and the suppression join must match
    // them too (null-safe equality): a plain equi-join would leave the
    // non-null halves of these quasi tuples exposed.
    val df = Seq(
      (Some("a"), Some(1L), 10L), (Some("a"), Some(1L), 11L), (Some("a"), Some(1L), 12L),
      (None: Option[String], Some(2L), 13L), (None: Option[String], Some(2L), 14L),
      (Some("b"), None: Option[Long], 15L)).toDF("t", "g", "payload")
    val quasi = Seq("t" -> col("t"), "g" -> col("g"))
    val anon = Privacy.kAnonymize(df, quasi, k = 3)
    assert(anon.count() == 6L, "suppression must not drop rows")
    val suppressed = anon.where(col("t").isNull && col("g").isNull)
      .select(col("payload")).collect().map(_.getLong(0)).sorted
    assert(suppressed.toSeq == Seq(13L, 14L, 15L),
      "NULL-quasi violators must be fully suppressed, exposing neither half")
    assert(anon.where(col("t") === "a" && col("g") === 1L).count() == 3L)
  }

  test("lDiversityAudit flags homogeneous classes a k-audit passes") {
    import org.apache.spark.sql.functions.col
    // class (a,1): 3 rows but ONE user — k=3-anonymous yet l=2-violating;
    // class (a,2): 3 rows, 3 users — diverse; class (b,1): 2 rows, 2 users
    val df = Seq(
      ("a", 1L, "u1"), ("a", 1L, "u1"), ("a", 1L, "u1"),
      ("a", 2L, "u1"), ("a", 2L, "u2"), ("a", 2L, "u3"),
      ("b", 1L, "u4"), ("b", 1L, "u5")).toDF("t", "g", "user")
    val quasi = Seq("t" -> col("t"), "g" -> col("g"))
    assert(Privacy.kAnonymityAudit(df.where(col("t") === "a"), quasi, k = 3).count() == 0L,
      "both a-classes are k=3-anonymous")
    val viol = Privacy.lDiversityAudit(df, quasi, col("user"), l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viol.toSeq == Seq(("a", 1L, 3L, 1L)),
      "only the single-user class violates distinct 2-diversity")
    intercept[IllegalArgumentException](
      Privacy.lDiversityAudit(df, quasi, col("user"), l = 1))
  }

  test("piiScan: per-class counts on the original text, taxonomy-order masking") {
    val df = Seq(
      "mail a@b.co or c.d-e@f.org call 12-345-678-9012 from 10.0.0.1 acct 123456789",
      "no pii here at all",
      "id 9999999999999999 and boundary x123456789 stays").toDF("text")
    val got = Privacy.piiScan(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got(0) == (
      "mail a@b.co or c.d-e@f.org call 12-345-678-9012 from 10.0.0.1 acct 123456789",
      2L, 1L, 1L, 1L,
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP> acct <ID>"), s"got ${got(0)}")
    assert(got(1) == ("no pii here at all", 0L, 0L, 0L, 0L, "no pii here at all"))
    // a digit run glued to a word char has no boundary — never masked
    assert(got(2)._5 == 1L &&
      got(2)._6 == "id <ID> and boundary x123456789 stays", s"got ${got(2)}")
  }
}
