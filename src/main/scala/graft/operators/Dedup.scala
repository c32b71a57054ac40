package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines, in increasing
  * fuzziness: exact (fingerprint), n-gram Jaccard (lossless prefix-filtered
  * candidates), MinHash+LSH (probabilistic candidates), SimHash (hamming),
  * and embedding-cosine near-dup (see [[Similarity]]).
  *
  * Scale design: nothing here is O(n²) on the full corpus.
  * - exact: one hash-shuffle on the 16-byte fingerprint.
  * - ngram-jaccard: AllPairs/PPJoin-style prefix filtering — docs can only
  *   pair if they share a gram inside a (threshold-sized) prefix of their
  *   rarity-sorted gram list, which is *lossless* for Jaccard >= t, so
  *   results are exact while the join fans out on rare grams only.
  * - minhash-LSH: signatures are computed MAP-SIDE (array expressions over
  *   each doc's gram set — no explode, no shuffle); the only shuffle is the
  *   (band, bandHash) bucket join.
  * - simhash: signature map-side; pairing via the block-permuted index
  *   (pigeonhole-lossless equi-join), never an all-pairs cross join.
  */
object Dedup {

  /** Exact dedup groups: fingerprint → surviving (minimum) doc id + group
    * size. One shuffle on the fingerprint.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Distinct word n-grams (shingles) of the normalized text, as an array
    * column named `grams`.
    */
  def shingles(docs: DataFrame, n: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // gram i = tokens[i..i+n-1] joined by space, for i in 0 .. size-n;
    // docs with fewer than n tokens have no grams (guarded — sequence()
    // would otherwise run backwards on size-n < 0)
    val grams = when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), grams.as("grams")).where(size(col("grams")) > 0)
  }

  /** Candidate pairs for [[ngramJaccardPairs]] via lossless prefix filtering
    * (AllPairs/PPJoin family): order every doc's grams by global rarity; two
    * docs with Jaccard >= t MUST share a gram within the first
    * `|g| - ceil(t*|g|) + 1` grams of that ordering (pigeonhole), so the
    * candidate join only fans out on prefix grams. Exposed separately so
    * tests can assert the filter actually prunes (DedupSpec checks the
    * candidate count is strictly below all-pairs on the real corpus).
    */
  def ngramJaccardCandidates(
      grams: DataFrame,
      threshold: Double,
      idCol: String = "doc_id"): DataFrame = {
    val exploded = grams.select(col(idCol), explode(col("grams")).as("gram"))
    val freq = exploded.groupBy(col("gram")).agg(count(lit(1)).as("freq"))

    // Rarity-sorted gram array per doc, via a FIXED-WIDTH sortable string key
    // (10-char zero-padded freq prefix + the gram). The gram is recovered by
    // position — substring from char 11 — so no separator is needed and no
    // gram content can break the decode.
    val ranked = exploded
      .join(freq, "gram")
      .withColumn("key", concat(lpad(col("freq").cast("string"), 10, "0"), col("gram")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("key"))).as("sorted_keys"))
      .withColumn("n_grams", size(col("sorted_keys")))
      .withColumn("prefix_len", col("n_grams") - ceil(lit(threshold) * col("n_grams")).cast("int") + 1)
      .select(
        col(idCol),
        transform(slice(col("sorted_keys"), lit(1), col("prefix_len").cast("int")),
          k => substring(k, 11, Int.MaxValue)).as("prefix"))

    val pf = ranked.select(col(idCol), explode(col("prefix")).as("gram"))
    pf.as("l").join(pf.as("r"), Seq("gram"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact all-pairs n-gram Jaccard >= threshold. Candidates come from the
    * lossless prefix filter ([[ngramJaccardCandidates]]); each candidate is
    * then verified with the exact Jaccard. Output: (doc_a, doc_b, jaccard)
    * with doc_a < doc_b.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val g = shingles(docs, n, idCol, textCol)
    val cand = ngramJaccardCandidates(g, threshold, idCol)

    val ga = g.select(col(idCol).as("doc_a"), col("grams").as("grams_a"))
    val gb = g.select(col(idCol).as("doc_b"), col("grams").as("grams_b"))
    cand.join(ga, "doc_a").join(gb, "doc_b")
      .withColumn("n_inter", size(array_intersect(col("grams_a"), col("grams_b"))).cast("double"))
      .withColumn(
        "jaccard",
        col("n_inter") / (size(col("grams_a")) + size(col("grams_b")) - col("n_inter")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ── MinHash ───────────────────────────────────────────────────────────
  // 32 deterministic affine permutations h_i(x) = (a_i*x32 + b_i) mod p over
  // a 32-bit gram hash derived from md5 (engine-neutral: DuckDB reproduces
  // it bit-for-bit). p = 2^31-1; a < 2^30 keeps a*x + b < 2^63.
  val MinhashP: Long = 2147483647L
  val MinhashSeeds: Seq[(Long, Long)] = Seq(
    (686579305L, 239081663L), (26855093L, 590620971L), (262950629L, 479341423L),
    (149827707L, 220106707L), (726600541L, 186699713L), (634036507L, 906070220L),
    (34126397L, 63989047L), (100604503L, 469521477L), (249817735L, 56985561L),
    (602632299L, 427000596L), (768820205L, 900911954L), (236696313L, 964669077L),
    (632719213L, 597409992L), (869119331L, 13955983L), (814763203L, 342865762L),
    (749621471L, 907557512L), (365341215L, 596724164L), (166944845L, 462382781L),
    (1027799705L, 722831292L), (109747453L, 199170184L), (407943841L, 207696843L),
    (385451173L, 738639288L), (648245889L, 568054227L), (866647393L, 93309105L),
    (783543541L, 986607411L), (575770531L, 268062140L), (1044875093L, 812896393L),
    (84611067L, 629595552L), (890566477L, 776605304L), (619927153L, 412936598L),
    (756528253L, 149368553L), (49203559L, 489407815L))

  /** 32-bit integer hash of a gram via md5 (first 8 hex chars). */
  def gramHash32(gram: Column): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long")

  /** MinHash signature (array of 32 longs) per doc over its n-gram set.
    *
    * Fully MAP-SIDE: each gram is md5-hashed once into an array, then every
    * permutation's min is an `array_min(transform(...))` over that array —
    * no explode, no groupBy, no shuffle (the r1 explode+groupBy build cost
    * 60 s at sf0.1; this is a single projection).
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = shingles(docs, n, idCol, textCol)
    // separate projection: `hs` is md5-heavy and referenced 32 times below,
    // so CollapseProject keeps it materialized once per row
    val hashed = g.select(col(idCol), transform(col("grams"), gr => gramHash32(gr)).as("hs"))
    val sig = array(MinhashSeeds.map { case (a, b) =>
      array_min(transform(col("hs"), h => (h * a + b) % MinhashP))
    }: _*)
    hashed.select(col(idCol), sig.as("sig"))
  }

  /** MinHash+LSH near-dup candidate pairs: band the 32-slot signature into
    * `bands` buckets of `32/bands` rows; docs sharing any band bucket pair
    * up. `est_jaccard` = fraction of matching signature slots. Deterministic
    * (candidates follow from signatures alone), so oracle-checkable.
    */
  def minhashLshPairs(
      docs: DataFrame,
      bands: Int = 8,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val k = MinhashSeeds.size
    require(k % bands == 0)
    val rows = k / bands
    val sigs = minhashSignatures(docs, n, idCol, textCol)

    val banded = sigs.select(
      col(idCol),
      posexplode(
        array((0 until bands).map(b =>
          concat_ws(",", (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)): _*))
        .as(Seq("band", "band_key")))

    val cand = banded.as("l").join(banded.as("r"), Seq("band", "band_key"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"))
      .distinct()

    val sa = sigs.select(col(idCol).as("doc_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col(idCol).as("doc_b"), col("sig").as("sig_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn(
        "n_match",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b)))
      .select(
        col("doc_a"), col("doc_b"),
        round(col("n_match").cast("double") / k, 6).as("est_jaccard"))
  }

  // ── SimHash ───────────────────────────────────────────────────────────

  /** 60-bit SimHash over unigram tokens: per bit, sum +1/-1 votes from each
    * distinct token's 60-bit md5-derived hash; bit set iff vote > 0.
    *
    * MAP-SIDE: the distinct-token hash array is computed once per doc, then
    * each bit's vote is an `aggregate` over that array — one projection, no
    * explode-by-60 blowup and no groupBy shuffles (the r1 build shuffled
    * |tokens|×60 rows twice).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hs = transform(
      array_distinct(TextAnalysis.tokens(col(textCol))),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val hashed = docs.select(col(idCol), hs.as("hs"))
    val bitvals = (0 until 60).map { bit =>
      val votes = aggregate(
        col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }
    hashed.select(col(idCol), bitvals.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, via the
    * block-permuted index: split the 60 bits into `maxHamming + 1` blocks —
    * any pair within the hamming budget must match EXACTLY on at least one
    * block (pigeonhole), so an equi-join on (block, blockValue) is a lossless
    * candidate filter. The exact hamming check then runs per candidate. No
    * cross join anywhere in the plan (asserted by DedupSpec).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val nBlocks = maxHamming + 1
    val bounds = (0 to nBlocks).map(i => i * 60 / nBlocks)
    val blockVals = (0 until nBlocks).map { i =>
      val start = bounds(i)
      val width = bounds(i + 1) - start
      shiftright(col("simhash"), start).bitwiseAND(lit((1L << width) - 1L))
    }
    val idx = sh.select(
      col(idCol), col("simhash"),
      posexplode(array(blockVals: _*)).as(Seq("blk", "blk_val")))

    idx.as("l").join(idx.as("r"), Seq("blk", "blk_val"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(
        col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"),
        col("l.simhash").as("sh_a"), col("r.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }
}
