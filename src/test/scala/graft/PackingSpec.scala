package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Budget = 8
  private val Shards = 2

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e"),
      (2L, "f g h"),
      (3L, ""), // empty → dropped (phantom-token guard)
      (4L, "   \t "), // whitespace-only → dropped
      (5L, (1 to 12).map(i => s"t$i").mkString(" ")), // spans cuts at budget 8
      (6L, "x y"),
      (7L, "one two three four five six seven"),
      (8L, "q r s t u v w")
    ).toDF("doc_id", "text")
  }

  test("layout: contiguous disjoint intervals per shard, degenerate docs dropped") {
    val rows = Packing.packSequences(fixture, Budget, Shards).collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(3L) && !ids.contains(4L), "empty docs must not pack")
    assert(ids.size == 6)
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      var cursor = 0L
      rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_tok") == cursor, "docs must abut: no gaps, no overlap")
        cursor += r.getAs[Long]("n_tokens")
      }
    }
    rows.foreach { r =>
      val start = r.getAs[Long]("start_tok")
      val n = r.getAs[Long]("n_tokens")
      assert(n > 0)
      assert(r.getAs[Long]("seq_in_shard") == start / Budget)
      assert(r.getAs[Long]("offset_in_seq") == start % Budget)
      assert(r.getAs[Long]("n_seqs") == (start + n - 1) / Budget - start / Budget + 1)
    }
  }

  test("a doc wider than the remaining window spans multiple sequences") {
    val spanning = Packing.packSequences(fixture, Budget, Shards)
      .where(col("n_tokens") > Budget).collect()
    assert(spanning.nonEmpty, "fixture doc 5 (12 tokens) must exceed the budget")
    spanning.foreach(r => assert(r.getAs[Long]("n_seqs") >= 2))
  }

  test("layout is a pure function of the data: invariant under input partitioning") {
    val a = Packing.packSequences(fixture, Budget, Shards).orderBy("doc_id").collect().toSeq
    val b = Packing.packSequences(fixture.repartition(7), Budget, Shards)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("token conservation: every shard's stream covers exactly its docs' tokens") {
    Packing.packSequences(fixture, Budget, Shards)
      .groupBy("shard")
      .agg(
        sum("n_tokens").as("total"),
        max(col("start_tok") + col("n_tokens")).as("stream_end"))
      .collect()
      .foreach(r => assert(r.getAs[Long]("total") == r.getAs[Long]("stream_end")))
  }
}
