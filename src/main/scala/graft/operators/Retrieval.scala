package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (BM25) and hybrid (reciprocal-rank fusion) retrieval over the
  * document corpus — the seed-expansion machinery of a data-selection
  * pipeline: "find more documents like these curated seeds" is how
  * importance-sampled pretraining pools and domain-targeted subsets get
  * built, and serving it needs exactly one lexical ranker, one dense
  * ranker, and a deterministic fusion rule.
  *
  * Scale shape: the term-side join is the classic inverted-index shuffle —
  * per-term postings (`tf` rows) hash-partitioned by term, the query side
  * broadcast (a query set is KB-scale against a 100 TB corpus); document
  * stats (`dl`, `avgdl`, `N`) ride as one-row broadcasts. The dense side
  * here is the declared brute-force ground truth; at corpus scale swap in
  * the banded-LSH / IVF route ([[Similarity.lshKnn]], [[Similarity.ivfKnn]])
  * — the fusion is ranker-agnostic by construction.
  *
  * Determinism: BM25 scores quantize per (term, doc) contribution AND the
  * per-doc sum to 6 decimals (the [[LanguageModel]] discipline), ranks
  * break ties on doc id, and the RRF fusion is pure integer arithmetic
  * (`scale div (k + rank)` summed over rankers) — so the full hybrid
  * ranking replays bitwise in the DuckDB oracle.
  */
object Retrieval {

  /** Okapi BM25 parameters; the classic defaults. */
  val K1: Double = 1.2
  val B: Double = 0.75

  private def toks(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)

  /** BM25 score for every (query, doc) pair with at least one matching
    * term. `qterms`: (query_id, term) — pre-deduplicated query terms.
    * Output: (query_id, doc_id, score), score quantized to 6 decimals.
    */
  def bm25Scores(docs: DataFrame, qterms: DataFrame): DataFrame = {
    val t = toks(docs)
    val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // one-row scalar frames: corpus size and mean doc length
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val avg = dl.agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = tf
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", idfExpr(col("n"), col("df")))
      .select(col("term"), col("idf"))
    scoreJoined(qterms, tf, idf, dl, avg)
  }

  /** The round-6 Robertson-Sparck-Jones idf both the in-query derivation
    * and the stored index share — one expression, no drift.
    */
  private def idfExpr(n: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column) =
    round(log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5))), 6)

  /** The BM25 scoring tail shared by [[bm25Scores]] (components derived
    * from the corpus in-query) and [[bm25TopKPersisted]] (components read
    * from the stored inverted index): per-(term, doc) contribution and the
    * per-doc sum, both quantized to 6 decimals.
    */
  private def scoreJoined(
      qterms: DataFrame,
      tf: DataFrame,
      idf: DataFrame,
      dl: DataFrame,
      avg: DataFrame): DataFrame =
    broadcast(qterms)
      .join(tf, "term")
      .join(idf, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(avg))
      .withColumn(
        "s",
        round(
          col("idf") * (col("tf") * lit(K1 + 1)) /
            (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))),
          6))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("s")), 6).as("score"))

  /** PERSIST the BM25 inverted index — the serving shape: a real retrieval
    * pipeline derives postings/idf/doc-lengths ONCE at corpus build and
    * scores every later query batch from the stored tables (the
    * [[Similarity.ivfIndexWrite]] discipline, lexical side). Four parquet
    * tables under `indexPath`:
    *
    *  - `postings/` — (term, doc_id, tf): the inverted index, the only
    *    corpus-sized relation, hash-partitioned by term at scale;
    *  - `terms/` — (term, df, idf): round-6 idf precomputed with the SAME
    *    expression [[bm25Scores]] derives in-query;
    *  - `doclens/` — (doc_id, dl);
    *  - `meta/` — one geometry row (n_docs, avgdl, k1, b): scoring
    *    parameters are part of the index identity — a probe under
    *    different k1/b must fail loudly, not return silently-different
    *    scores.
    */
  def bm25IndexWrite(docs: DataFrame, indexPath: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = toks(docs)
    val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val nDocs = docs.count()
    val avgdl = dl.agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .head().getDouble(0)
    tf.write.mode("overwrite").parquet(s"$indexPath/postings")
    dl.write.mode("overwrite").parquet(s"$indexPath/doclens")
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf", idfExpr(lit(nDocs), col("df")))
      .write.mode("overwrite").parquet(s"$indexPath/terms")
    Seq((nDocs, avgdl, K1, B, 0L)).toDF("n_docs", "avgdl", "k1", "b", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Incrementally maintain a PERSISTED BM25 index ([[bm25IndexWrite]])
    * with a new ingest batch — the postings/df merge that closes the
    * ingest loop: postings and doc-lengths for the NEW docs append (the
    * only batch-sized work), per-term `df` merges by addition with the
    * stored term table (vocabulary-sized, not corpus-sized), and
    * `idf`/`avgdl`/`n_docs` recompute from the merged statistics with the
    * SAME expressions the full build uses. BM25's corpus statistics are
    * all additive (df, dl sums, doc counts), so the merged index is
    * EXACTLY the index a from-scratch [[bm25IndexWrite]] over the union
    * corpus would produce — table-for-table set-equal, and therefore
    * probe-for-probe bitwise (`bm25_topk_incr`'s oracle is the full-corpus
    * ranking itself; RetrievalSpec pins the table-level equality). Cost
    * scales with the batch + vocabulary, never the indexed corpus — the
    * [[graft.operators.Similarity.ivfIndexAppend]] discipline, lexical
    * side.
    *
    * New doc ids must be DISJOINT from the indexed ids (a re-ingested doc
    * would double its postings and silently inflate every score — fail
    * loudly; dedup the batch first). `version` bumps so readers can tell
    * index generations apart; atomicity across the four table writes is
    * [[graft.sources.SnapshotLog]]'s job under a managed table root.
    */
  def bm25IndexMerge(newDocs: DataFrame, indexPath: String): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    require(meta.getAs[Double]("k1") == K1 && meta.getAs[Double]("b") == B,
      s"index at $indexPath was built with k1=${meta.getAs[Double]("k1")}, " +
        s"b=${meta.getAs[Double]("b")} but this builder uses k1=$K1, b=$B")
    val storedDl = spark.read.parquet(s"$indexPath/doclens")
    val overlap = newDocs.select(col("doc_id"))
      .join(storedDl.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(overlap == 0L,
      s"bm25IndexMerge: new batch shares doc ids with the index at $indexPath — " +
        "re-ingested docs would double-count in every score; dedup the batch first")
    val t = toks(newDocs)
    val newTf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val newDl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    newTf.write.mode("append").parquet(s"$indexPath/postings")
    newDl.write.mode("append").parquet(s"$indexPath/doclens")
    // df merge: stored (vocab-sized) ⊎ batch, summed per term — disjoint
    // docs mean a (term, doc) posting can't collide, so addition is exact
    val mergedNDocs = meta.getAs[Long]("n_docs") + newDocs.count()
    spark.read.parquet(s"$indexPath/terms").select(col("term"), col("df"))
      .union(newTf.groupBy(col("term")).agg(count(lit(1)).as("df")))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .withColumn("idf", idfExpr(lit(mergedNDocs), col("df")))
      .write.mode("overwrite").parquet(s"$indexPath/terms_merged")
    // swap via re-write (terms is vocab-sized): Spark refuses to overwrite
    // a path it is reading in the same plan, so stage then re-write the
    // canonical location and drop the staging dir
    spark.read.parquet(s"$indexPath/terms_merged")
      .write.mode("overwrite").parquet(s"$indexPath/terms")
    val fs = new org.apache.hadoop.fs.Path(s"$indexPath/terms_merged")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/terms_merged"), true)
    // avgdl from the merged doclens relation: dl values are exact longs, so
    // the double division is bitwise the from-scratch build's
    val mergedAvgdl = spark.read.parquet(s"$indexPath/doclens")
      .agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .head().getDouble(0)
    Seq((mergedNDocs, mergedAvgdl, K1, B, meta.getAs[Long]("version") + 1L))
      .toDF("n_docs", "avgdl", "k1", "b", "version")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** Top-k BM25 from the STORED index ([[bm25IndexWrite]]): no corpus
    * scan, no idf re-derivation — the query terms broadcast into the
    * postings join exactly as the in-query ranker plans it, and the
    * scoring tail is the shared [[scoreJoined]], so the stored probe
    * returns bitwise [[bm25TopK]]'s result. Meta parameters are
    * re-verified before any work.
    */
  def bm25TopKPersisted(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: Seq[(String, String)],
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    require(meta.getAs[Double]("k1") == K1 && meta.getAs[Double]("b") == B,
      s"index at $indexPath was built with k1=${meta.getAs[Double]("k1")}, " +
        s"b=${meta.getAs[Double]("b")} but this scorer uses k1=$K1, b=$B")
    val qterms = queries
      .flatMap { case (qid, text) => text.split("\\s+").filter(_.nonEmpty).distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val avg = spark.read.parquet(s"$indexPath/meta").select(col("avgdl"))
    val scored = scoreJoined(
      qterms,
      spark.read.parquet(s"$indexPath/postings"),
      spark.read.parquet(s"$indexPath/terms").select(col("term"), col("idf")),
      spark.read.parquet(s"$indexPath/doclens"),
      avg)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Top-k BM25 hits per query. `queries`: (query_id, query text) literal
    * pairs; terms are whitespace-split and deduplicated (each query term
    * scores once — the standard short-query form). Output:
    * (query_id, doc_id, score, rank), rank 1..k, ties on doc id.
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(String, String)], k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, text) => text.split("\\s+").filter(_.nonEmpty).distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    bm25Scores(docs, qterms)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Query-by-example hybrid seed expansion: for each seed document, rank
    * the rest of the corpus by reciprocal-rank fusion of (a) BM25 with the
    * seed's own distinct tokens as the query and (b) exact cosine over the
    * aligned embedding table. Each ranker contributes its top `poolK`;
    * a document missing from one ranker's pool contributes 0 from it
    * (rank columns report 0 for absent). RRF is integer:
    * `rrfScale div (rrfK + rank)` summed over the two rankers.
    *
    * Output: (seed_id, doc_id, lex_rank, vec_rank, rrf, rank), rank 1..k
    * by descending fused score, ties on doc id; the seed itself is
    * excluded from both pools.
    */
  /** Freeze the corpus lexicon for ingestion-time scoring: the round-6
    * idf of each requested term (terms absent from the corpus get no
    * entry — [[bm25Scores]] drops them the same way via its join) and the
    * corpus avgdl, computed with EXACTLY the expressions bm25Scores uses,
    * so a frozen-model scorer reproduces batch scores bitwise.
    */
  def frozenLexicon(docs: DataFrame, terms: Seq[String]): (Map[String, Double], Double) = {
    val t = toks(docs)
    val avgdl = t.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .first().getDouble(0)
    val n = docs.count()
    val idf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .where(col("term").isin(terms.distinct: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn(
        "idf",
        round(log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    (idf, avgdl)
  }

  /** The lexical query-by-example pool: BM25 with each seed doc's distinct
    * tokens as the query, seed excluded, top `poolK` per seed. Output:
    * (query_id, doc_id, lex_rank).
    */
  def lexPool(docs: DataFrame, seeds: Seq[Long], poolK: Int): DataFrame = {
    val qterms = toks(docs)
      .where(col("doc_id").isin(seeds: _*))
      .select(col("doc_id").as("query_id"), col("term"))
      .distinct()
    val wl = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    bm25Scores(docs, qterms)
      .where(col("doc_id") =!= col("query_id"))
      .withColumn("lex_rank", row_number().over(wl).cast("long"))
      .where(col("lex_rank") <= poolK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"))
  }

  /** The dense pool: exact cosine KNN from each seed's embedding (self
    * excluded by [[Similarity.bruteForceKnn]]). Output:
    * (query_id, doc_id, vec_rank).
    */
  def vecPool(embeddings: DataFrame, seeds: Seq[Long], poolK: Int): DataFrame =
    Similarity
      .bruteForceKnn(embeddings.where(col("vec_id").isin(seeds: _*)), embeddings, k = poolK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank").as("vec_rank"))

  /** Integer RRF contribution for a nullable rank column: 0 when the doc
    * is absent from that ranker's pool.
    */
  def rrfContrib(rankCol: String, rrfK: Long, rrfScale: Long): org.apache.spark.sql.Column =
    when(col(rankCol).isNotNull, expr(s"$rrfScale div ($rrfK + $rankCol)"))
      .otherwise(lit(0L))

  def hybridSeedExpand(
      docs: DataFrame,
      embeddings: DataFrame,
      seeds: Seq[Long],
      k: Int = 10,
      poolK: Int = 100,
      rrfK: Long = 60L,
      rrfScale: Long = 1000000000L): DataFrame = {
    require(seeds.nonEmpty, "hybridSeedExpand: empty seed set")
    require(k >= 1 && poolK >= k, s"need 1 <= k <= poolK, got k=$k poolK=$poolK")
    val wf = Window.partitionBy(col("seed_id")).orderBy(col("rrf").desc, col("doc_id"))
    lexPool(docs, seeds, poolK)
      .join(vecPool(embeddings, seeds, poolK), Seq("query_id", "doc_id"), "full_outer")
      .select(
        col("query_id").as("seed_id"),
        col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
        (rrfContrib("lex_rank", rrfK, rrfScale) + rrfContrib("vec_rank", rrfK, rrfScale))
          .as("rrf"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .where(col("rank") <= k)
  }

  /** TRIMODAL seed expansion: the lexical and dense pools plus a GRAPH
    * pool — personalized PageRank over a similarity-pair graph, computed
    * for ALL seeds in ONE batched run
    * ([[GraphRank.personalizedPagerankMulti]]: the seed dimension rides in
    * the shuffle key, so the graph pool costs `iters` full-graph passes
    * regardless of seed count, while each seed's ranks stay bitwise equal
    * to a single-seed [[GraphRank.personalizedPagerank]] run) — fused by
    * the same integer RRF. The three rankers catch different
    * neighbors: wording (BM25), semantics (cosine), and similarity-graph
    * reachability (PPR — a doc two hops of near-dup away scores even when
    * it shares neither vocabulary nor embedding direction with the seed).
    * Seeds must be graph nodes of `pairs`. Output: (seed_id, doc_id,
    * lex_rank, vec_rank, ppr_rank, rrf, rank), rank 1..k per seed.
    */
  def trimodalSeedExpand(
      docs: DataFrame,
      embeddings: DataFrame,
      pairs: DataFrame,
      seeds: Seq[Long],
      k: Int = 10,
      poolK: Int = 100,
      pprIters: Int = 6,
      pprScale: Long = 1000000000000L,
      rrfK: Long = 60L,
      rrfScale: Long = 1000000000L): DataFrame = {
    require(seeds.nonEmpty, "trimodalSeedExpand: empty seed set")
    require(k >= 1 && poolK >= k, s"need 1 <= k <= poolK, got k=$k poolK=$poolK")
    val wp = Window.partitionBy(col("query_id")).orderBy(col("rank").desc, col("doc_id"))
    // ONE batched PPR run for all seeds ([[GraphRank.personalizedPagerankMulti]]:
    // bitwise equal to per-seed runs, but one join+agg per iteration
    // regardless of seed count — S·iters graph passes collapse to iters)
    val ppr = GraphRank
      .personalizedPagerankMulti(pairs, seeds, iters = pprIters, scale = pprScale,
        seedOut = "query_id")
      .where(col("doc_id") =!= col("query_id"))
      .withColumn("ppr_rank", row_number().over(wp).cast("long"))
      .where(col("ppr_rank") <= poolK)
      .select(col("query_id"), col("doc_id"), col("ppr_rank"))
    val wf = Window.partitionBy(col("seed_id")).orderBy(col("rrf").desc, col("doc_id"))
    lexPool(docs, seeds, poolK)
      .join(vecPool(embeddings, seeds, poolK), Seq("query_id", "doc_id"), "full_outer")
      .join(ppr, Seq("query_id", "doc_id"), "full_outer")
      .select(
        col("query_id").as("seed_id"),
        col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
        coalesce(col("ppr_rank"), lit(0L)).as("ppr_rank"),
        (rrfContrib("lex_rank", rrfK, rrfScale) + rrfContrib("vec_rank", rrfK, rrfScale)
          + rrfContrib("ppr_rank", rrfK, rrfScale)).as("rrf"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .where(col("rank") <= k)
  }

  /** The canonical text normalization ([[TextAnalysis.normalize]]) applied
    * driver-side to a query phrase, so index and query agree on case and
    * whitespace.
    */
  private[graft] def normalizePhrase(p: String): String =
    p.toLowerCase.replaceAll("\\s+", " ").trim

  /** SUBSTRING search through a character-trigram inverted index — the
    * pg_trgm / Google-code-search architecture (Cox, "Regular Expression
    * Matching with a Trigram Index", 2012, public): a literal phrase can
    * only occur in documents containing ALL of the phrase's character
    * trigrams, so the index join + count filter yields a candidate set
    * that provably SUPERSETS the answer, and only candidates pay the
    * exact `contains` verification scan. At 100 TB the postings are the
    * standard term-sharded inverted layout (here trigram-sharded), the
    * query side is a broadcast literal frame, and verification touches
    * candidate documents only — the full-corpus `LIKE '%…%'` scan this
    * exists to avoid.
    *
    * Per verified match: (query_id, doc_id) plus the per-query
    * `n_candidates` / `n_matches` audit pair — the index's filtering
    * power measured in-query (candidates ⊇ matches is structural; a
    * candidate count below the match count is impossible by
    * construction, so the two columns also gate index completeness).
    * Phrases must normalize to ≥ 3 characters.
    */
  def trigramSearch(
      docs: DataFrame,
      phrases: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(phrases.nonEmpty, "trigramSearch: at least one phrase required")
    val spark = docs.sparkSession
    import spark.implicits._
    val normed = phrases.map { case (q, p) => (q, normalizePhrase(p)) }
    normed.foreach { case (q, p) =>
      require(p.length >= 3, s"trigramSearch: phrase '$q' normalizes below 3 chars: '$p'")
    }
    val qtris = normed
      .flatMap { case (q, p) =>
        val tris = p.sliding(3).toSet.toSeq.sorted
        tris.map(t => (q, t, tris.size.toLong))
      }
      .toDF("query_id", "tg", "n_tris")
    val phraseDf = normed.toDF("query_id", "phrase")
    val nt = docs
      .select(col(idCol), TextAnalysis.normalize(col(textCol)).as("t"))
      .where(length(col("t")) >= 3)
    val postings = nt.select(col(idCol), explode(array_distinct(
      expr("transform(sequence(1, length(t) - 2), i -> substr(t, i, 3))"))).as("tg"))
    val cand = postings.join(broadcast(qtris), Seq("tg"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit"), max(col("n_tris")).as("n_tris"))
      .where(col("n_hit") === col("n_tris"))
      .select(col("query_id"), col(idCol))
    val nCand = cand.groupBy(col("query_id")).agg(count(lit(1)).as("n_candidates"))
    val verified = cand
      .join(nt, idCol)
      .join(broadcast(phraseDf), Seq("query_id"))
      .where(instr(col("t"), col("phrase")) > 0)
      .select(col("query_id"), col(idCol))
    val nMatch = verified.groupBy(col("query_id")).agg(count(lit(1)).as("n_matches"))
    verified
      .join(broadcast(nCand), Seq("query_id"))
      .join(broadcast(nMatch), Seq("query_id"))
      .orderBy(col("query_id"), col(idCol))
  }
}
