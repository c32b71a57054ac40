package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (O(Q·N) — fine when the
  * query set is small or as the per-bucket step); the LSH/IVF bucketed
  * variant is the 100 TB path: deterministic random-hyperplane signs bucket
  * the corpus so each query only scans its probe buckets. All math is plain
  * column expressions (codegen'd float→double ops), no UDFs.
  */
object Similarity {

  /** Left-to-right dot product of two double arrays (deterministic order —
    * matches the SQL oracle's list_sum over an index comprehension).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k, deterministic
    * tie-break on neighbor id.
    */
  def bruteForceKnn(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    // small query set → broadcast; every corpus partition scans independently
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, doc_a < doc_b.
    * Exact all-pairs here; at scale, run per LSH bucket (see [[lshBuckets]])
    * with multi-probe for recall.
    */
  def cosineNearDupPairs(
      vectors: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = vectors.select(col(idCol).as("vec_a"), asDouble(col(vecCol)).as("va"))
    val b = vectors.select(col(idCol).as("vec_b"), asDouble(col(vecCol)).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic random-hyperplane LSH bucket id (`nPlanes` sign bits).
    * Plane p's component j is a fixed md5-derived pseudo-random value in
    * [-0.5, 0.5) — reproducible across engines and runs, no RNG state.
    */
  def lshBuckets(
      vectors: DataFrame,
      nPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val bits = (0 until nPlanes).map { p =>
      // dot(v, plane_p) where plane_p[j] = hash01(p, j) - 0.5
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(col(vecCol)) - 1), (x, j) =>
          x * (conv(substring(md5(concat_ws("_", lit(p), j)), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0) - lit(0.5))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, expr(s"shiftleft(CAST(1 AS BIGINT), $p)")).otherwise(lit(0L))
    }
    vectors.withColumn("bucket", bits.reduce(_ + _))
  }

  /** IVF-style approximate KNN: corpus and queries bucketed by [[lshBuckets]];
    * each query scans only its own bucket (single-probe). Approximate —
    * recall grows with fewer planes / multi-probe; exact within the bucket.
    */
  def lshKnn(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qb = lshBuckets(queries, nPlanes, idCol, vecCol)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"), col("bucket"))
    val cb = lshBuckets(corpus, nPlanes, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cb.join(broadcast(qb), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(
        col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }
}
