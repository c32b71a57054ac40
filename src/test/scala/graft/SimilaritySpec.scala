package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("brute-force knn: every query gets k ranked neighbors, rank-1 is the true argmax") {
    val emb = Tables.embeddings(spark, SfDir)
    val out = Similarity.bruteForceKnn(emb.where(col("vec_id") < 5), emb, k = 3).cache()
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
    // rank-1 cosine >= every other cosine for that query
    val r = out.collect().groupBy(_.getLong(0))
    r.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("lsh knn returns exact-within-bucket results (subset of brute-force domain)") {
    val emb = Tables.embeddings(spark, SfDir)
    val lsh = Similarity.lshKnn(emb.where(col("vec_id") < 5), emb, k = 3, nPlanes = 2)
    val brute = Similarity.bruteForceKnn(emb.where(col("vec_id") < 5), emb, k = 500)
    // every lsh cosine equals the brute-force cosine of the same pair
    val bmap = brute.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.collect().foreach { r =>
      assert(math.abs(bmap((r.getLong(0), r.getLong(1))) - r.getDouble(2)) < 1e-9)
    }
  }

  test("lsh buckets are deterministic across invocations") {
    val emb = Tables.embeddings(spark, SfDir)
    val b1 = Similarity.lshBuckets(emb, 4).select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.lshBuckets(emb, 4).select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
  }
}
