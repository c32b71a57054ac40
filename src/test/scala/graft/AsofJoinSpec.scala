package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def lefts(rows: (Long, Long, Long)*): DataFrame = // (id, key, sec)
    rows.toSeq.map { case (i, k, s) => (i, k, ts(s)) }.toDF("event_id", "user_id", "ts")

  private def rights(rows: (Long, Long, Double)*): DataFrame = // (key, sec, v)
    rows.toSeq.map { case (k, s, v) => (k, ts(s), v) }.toDF("user_id", "ts", "v")

  private def run(l: DataFrame, r: DataFrame, tol: Option[Long] = None): Map[Long, Option[Double]] =
    AsofJoin.asofBackward(l, r, "user_id", "ts", "ts", Seq("v"), tol)
      .collect()
      .map(row => row.getAs[Long]("event_id") -> Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double]))
      .toMap

  test("backward as-of: latest right at-or-before each left, <= on ties, null before first") {
    val l = lefts((1L, 7L, 4L), (2L, 7L, 5L), (3L, 7L, 12L), (4L, 8L, 100L))
    val r = rights((7L, 5L, 1.0), (7L, 10L, 2.0))
    val got = run(l, r)
    assert(got == Map(
      1L -> None,        // before any right row
      2L -> Some(1.0),   // equal timestamps match (<=)
      3L -> Some(2.0),   // latest of the two
      4L -> None))       // key with no right rows at all
  }

  test("forward as-of: earliest right at-or-after each left, >= on ties, null after last, tolerance") {
    def runF(l: DataFrame, r: DataFrame, tol: Option[Long] = None): Map[Long, Option[Double]] =
      AsofJoin.asofForward(l, r, "user_id", "ts", "ts", Seq("v"), tol)
        .collect()
        .map(row => row.getAs[Long]("event_id") -> Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double]))
        .toMap
    val l = lefts((1L, 7L, 4L), (2L, 7L, 5L), (3L, 7L, 12L), (4L, 8L, 100L))
    val r = rights((7L, 5L, 50.0), (7L, 10L, 100.0), (8L, 90L, 9.0))
    // id1@4 -> next right @5; id2@5 -> the EQUAL-ts right (>= semantics);
    // id3@12 -> nothing follows; id4@100 (key 8) -> nothing follows (90 < 100)
    assert(runF(l, r) == Map(
      1L -> Some(50.0), 2L -> Some(50.0), 3L -> None, 4L -> None))
    // tolerance 0: only the exact-ts match survives
    assert(runF(l, r, tol = Some(0L)) == Map(
      1L -> None, 2L -> Some(50.0), 3L -> None, 4L -> None))
  }

  test("tolerance nulls matches older than the window") {
    val l = lefts((1L, 7L, 12L), (2L, 7L, 14L))
    val r = rights((7L, 10L, 2.0))
    assert(run(l, r, tol = Some(2L)) == Map(1L -> Some(2.0), 2L -> None))
  }

  test("matches the naive theta-join argmax on randomized data") {
    val rnd = new scala.util.Random(7)
    val l = lefts((1L to 60L).map(i => (i, (rnd.nextInt(4) + 1).toLong, rnd.nextInt(50).toLong)): _*)
    // distinct (key, ts) on the right — the determinism contract
    val rRows = rnd.shuffle(
      (for (k <- 1L to 3L; s <- 0L until 50L by 3L) yield (k, s)).toSeq)
      .take(25).map { case (k, s) => (k, s, rnd.nextDouble()) }
    val r = rights(rRows: _*)

    def naive(tol: Option[Long]): Map[Long, Option[Double]] = {
      val inTol = tol match {
        case Some(n) =>
          unix_timestamp(col("l.ts")) - unix_timestamp(col("r.ts")) <= n
        case None => lit(true)
      }
      l.as("l").join(
        r.as("r"), col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
        .withColumn(
          "rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("l.event_id")).orderBy(col("r.ts").desc_nulls_last)))
        .where(col("rn") === 1)
        .select(col("l.event_id"), when(inTol, col("r.v")).as("v"))
        .collect().map(row => row.getLong(0) -> Option(row.get(1)).map(_.asInstanceOf[Double])).toMap
    }
    assert(run(l, r) == naive(None))
    // tolerance path against the same naive reference
    Seq(0L, 5L, 17L).foreach { t =>
      assert(run(l, r, tol = Some(t)) == naive(Some(t)), s"tolerance $t diverged")
    }
  }

  test("plan: one key exchange, no theta join blow-up") {
    val l = lefts((1L, 7L, 4L))
    val r = rights((7L, 5L, 1.0))
    val p = AsofJoin.asofBackward(l, r, "user_id", "ts", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")
      && !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"as-of must be the union-sort plan, not a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 key exchange, found $exchanges:\n$p")
  }

  test("pitJoinMulti: K features fill in one pass, <= semantics, cold-start nulls, contract refusals") {
    val fa = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("user_id", "t", "a")
    val fb = Seq((1L, 15L, 7L)).toDF("user_id", "t", "b")
    val req = Seq((1L, 5L), (1L, 10L), (1L, 17L), (1L, 25L), (2L, 10L))
      .toDF("user_id", "t")
    val got = AsofJoin.pitJoinMulti(req, "user_id", "t",
      Seq("a" -> fa, "b" -> fb))
      .orderBy(col("user_id"), col("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      (1L, 5L, None, None),            // before any observation
      (1L, 10L, Some(100L), None),     // equal-timestamp feature visible (<=)
      (1L, 17L, Some(100L), Some(7L)),
      (1L, 25L, Some(200L), Some(7L)),
      (2L, 10L, None, None)))          // key with no features: all cold
    // exactly ONE key exchange regardless of feature count
    val p = AsofJoin.pitJoinMulti(req, "user_id", "t",
      Seq("a" -> fa, "b" -> fb)).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 key exchange, found $exchanges:\n$p")
    intercept[IllegalArgumentException](
      AsofJoin.pitJoinMulti(req, "user_id", "t", Seq("a" -> fa, "a" -> fa)))
    intercept[IllegalArgumentException](
      AsofJoin.pitJoinMulti(req, "user_id", "t",
        Seq("bad" -> fa.withColumn("extra", lit(1)))))
  }
}
