package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // a heavily skewed big side: one hot key with most of the rows
  private lazy val big = ((1L to 80L).map(i => (1L, i)) ++ Seq((2L, 100L), (3L, 101L), (99L, 102L)))
    .toDF("k", "row_id")
  private lazy val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "label")

  test("salted inner join equals the plain join row-for-row") {
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", col("row_id"), salts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 82)
  }

  test("salted left join null-extends unmatched big rows exactly once") {
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", col("row_id"), salts = 5, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    val plain = big.join(small, Seq("k"), "left")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._3.isEmpty) == 1) // the k=99 row, exactly once
  }

  test("the hot key's rows actually spread across salt values") {
    val spread = big.withColumn("__salt", pmod(hash(col("row_id")), lit(7)))
      .where(col("k") === 1L)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(spread >= 5, s"80 hot rows landed on only $spread of 7 salts")
  }

  test("refuses inputs that already carry a __salt column instead of corrupting it") {
    val poisoned = big.withColumn("__salt", lit(0))
    val ex = intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(poisoned, small, "k", col("row_id"))
    }
    assert(ex.getMessage.contains("__salt"))
  }

  test("shuffleSkewReport: totals conserved, salting spreads the hot key's load") {
    // big is 80 rows of k=1 plus three singletons — a pile-up by design
    val rows = SkewJoin.shuffleSkewReport(
      big, col("k"), col("row_id"), nBuckets = 16, salts = 8)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val raw = rows("raw"); val salted = rows("salted")
    for (r <- Seq(raw, salted)) {
      assert(r.getAs[Long]("total_rows") == 83L)
      assert(r.getAs[Long]("n_buckets_used") <= 16L)
      assert(r.getAs[Long]("max_load") >= 83L / 16L)
      // imbalance_ppm is exactly max_load·16·1e6 div total
      assert(r.getAs[Long]("imbalance_ppm") ==
        r.getAs[Long]("max_load") * 16L * 1000000L / 83L)
    }
    // raw: all 80 hot rows share one bucket; salted: they spread over up
    // to 8 (key,salt) buckets, so the hottest bucket must shrink a lot
    assert(raw.getAs[Long]("max_load") >= 80L)
    assert(salted.getAs[Long]("max_load") < 40L,
      s"salting left max_load at ${salted.getAs[Long]("max_load")}")
    assert(salted.getAs[Long]("n_buckets_used") > raw.getAs[Long]("n_buckets_used"))
  }
}
