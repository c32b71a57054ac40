package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def toks = Tables.documents(spark, SfDir)
    .select(col("source"), explode(
      graft.operators.TextAnalysis.tokens(col("text"))).as("token"))

  test("merging per-source sketches equals sketching the whole corpus") {
    val direct = CountMin.sketch(toks, "token").collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    val merged = CountMin.merge(CountMin.sketch(toks, "token", Seq("source"))).collect()
      .map(r => (r.getAs[Int]("row"), r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    assert(direct == merged)
  }

  test("per-row conservation: every sketch row holds the full token mass") {
    val n = toks.count()
    val rowSums = CountMin.sketch(toks, "token")
      .groupBy(col("row")).agg(sum(col("cnt")).as("s")).collect()
      .map(r => r.getAs[Int]("row") -> r.getAs[Long]("s")).toMap
    assert(rowSums.keySet == (0 until CountMin.Depth).toSet)
    assert(rowSums.values.forall(_ == n))
  }

  test("sketch size is bounded by depth x width regardless of corpus size") {
    assert(CountMin.sketch(toks, "token").count() <= (CountMin.Depth * CountMin.Width).toLong)
  }

  test("one-sided guarantee: estimate >= exact count for EVERY token") {
    val sk = CountMin.sketch(toks, "token")
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
    val est = CountMin.estimate(sk, exact.select(col("token")), "token")
    val bad = exact.join(est, "token").where(col("est") < col("n_exact")).count()
    assert(bad == 0L)
  }

  test("innerProduct: overestimates the true join size, bounded by the count product") {
    import spark.implicits._
    val a = CountMin.sketch(Seq("a", "a", "b").toDF("k"), "k")
    val b = CountMin.sketch(Seq("a", "c").toDF("k"), "k")
    // true |A ⋈ B| on k: cA(a)·cB(a) = 2; Σ_b cA·cB never exceeds
    // (ΣcA)·(ΣcB) = 6 and never undershoots the true product sum
    val ab = CountMin.innerProduct(a, b).head().getLong(0)
    assert(ab >= 2L && ab <= 6L, s"cross inner product out of range: $ab")
    // self-join: Σ c(k)² = 4 + 1 = 5, bounded by N² = 9
    val aa = CountMin.innerProduct(a, a).head().getLong(0)
    assert(aa >= 5L && aa <= 9L, s"self inner product out of range: $aa")
    // estimate from a corpus-scale sketch stays one-sided on real keys
    val sk = CountMin.sketch(toks, "token")
    val exact = toks.groupBy(col("token")).count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(CountMin.innerProduct(sk, sk).head().getLong(0) >= exact)
  }

  test("an item absent from the corpus estimates as nonnegative collision mass, never null") {
    import spark.implicits._
    val sk = CountMin.sketch(toks, "token")
    val got = CountMin.estimate(sk, Seq("zzz-never-seen").toDF("token"), "token").collect()
    assert(got.length == 1)
    assert(!got.head.isNullAt(1) && got.head.getAs[Long]("est") >= 0L)
  }
}
