package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("dot product rejects mismatched vector lengths instead of truncating") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(graft.functions.VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("mismatched vector lengths")))
  }

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

  test("banded-lsh near-dup: subset of exact, candidates via equi-join, recall measured") {
    val emb = Tables.embeddings(spark, SfDir)
    val exact = Similarity.cosineNearDupPairs(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshDf = Similarity.cosineNearDupPairsLsh(emb, 0.4)
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "banded-lsh near-dup must not contain an all-pairs join")
    val lsh = lshDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "lsh pairs must be a subset of exact pairs")
    // deterministic (fixed planes, fixed corpus): b=3 L=24 gives >= 0.999
    // theoretical recall at cosine 0.4; assert a conservative floor
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below floor (${lsh.size}/${exact.size})")
  }

  test("multi-probe lsh knn: recall >= single-probe, cosines exact") {
    val emb = Tables.embeddings(spark, SfDir)
    val q = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceKnn(q, emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def found(probe: Int) =
      Similarity.lshKnn(q, emb, k = 3, nPlanes = 4, probeHamming = probe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sp = found(0)
    val mp = found(1)
    val recallSp = (sp intersect brute).size.toDouble / brute.size
    val recallMp = (mp intersect brute).size.toDouble / brute.size
    // the Hamming-1 ball strictly contains the single-probe bucket, and a
    // true top-k pair can only be outranked by another true top-k pair —
    // so multi-probe recall is monotonically >= single-probe
    assert(recallMp >= recallSp, s"multi-probe recall $recallMp < single-probe $recallSp")
    // every reported cosine is the true cosine of that pair
    val bmap = Similarity.bruteForceKnn(q, emb, k = 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.lshKnn(q, emb, k = 3, nPlanes = 4, probeHamming = 1).collect().foreach { r =>
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
