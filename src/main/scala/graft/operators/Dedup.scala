package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines, in increasing
  * fuzziness: exact (fingerprint), n-gram Jaccard (lossless prefix-filtered
  * all-pairs), MinHash+LSH (probabilistic candidates), SimHash (hamming), and
  * embedding-cosine near-dup (see [[Similarity]]).
  *
  * Scale design: nothing here is O(n²) on the full corpus.
  * - exact: one hash-shuffle on the 16-byte fingerprint.
  * - ngram-jaccard: AllPairs/PPJoin-style prefix filtering — docs can only
  *   pair if they share a gram inside a (threshold-sized) prefix of their
  *   rarity-sorted gram list, which is *lossless* for Jaccard >= t, so
  *   results are exact while the join fans out on rare grams only.
  * - minhash-LSH: fixed-size signatures, banded; the only shuffle is on
  *   (band, bandHash) buckets.
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

  /** Exact all-pairs n-gram Jaccard >= threshold via lossless prefix
    * filtering (AllPairs/PPJoin family): order every doc's grams by global
    * rarity; two docs with Jaccard >= t MUST share a gram within the first
    * `|g| - ceil(t*|g|) + 1` grams of that ordering (pigeonhole), so the
    * candidate join only fans out on prefix grams. Output: (doc_a, doc_b,
    * jaccard) with doc_a < doc_b.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val g = shingles(docs, n, idCol, textCol).cache()

    val exploded = g.select(col(idCol), explode(col("grams")).as("gram"))
    val freq = exploded.groupBy(col("gram")).agg(count(lit(1)).as("freq"))

    // rarity-sorted gram array per doc: sort by (freq, gram) via a
    // zero-padded sortable string key, then take the prefix
    val ranked = exploded
      .join(freq, "gram")
      .withColumn("key", concat(lpad(col("freq").cast("string"), 10, "0"), lit(""), col("gram")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("key"))).as("sorted_keys"))
      .withColumn("n_grams", size(col("sorted_keys")))
      .withColumn("prefix_len", col("n_grams") - ceil(lit(threshold) * col("n_grams")).cast("int") + 1)
      .select(
        col(idCol),
        transform(slice(col("sorted_keys"), lit(1), col("prefix_len").cast("int")),
          k => substring_index(k, "", -1)).as("prefix"))

    val pf = ranked.select(col(idCol), explode(col("prefix")).as("gram"))
    val cand = pf.as("l").join(pf.as("r"), Seq("gram"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("doc_a"), col(s"r.$idCol").as("doc_b"))
      .distinct()

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

  /** MinHash signature (array of 32 longs) per doc over its n-gram set. */
  def minhashSignatures(docs: DataFrame, n: Int = 3, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = shingles(docs, n, idCol, textCol)
    val hashed = g.select(col(idCol), explode(col("grams")).as("gram"))
      .withColumn("h", gramHash32(col("gram")))
    val mins = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"mh_$i")
    }
    hashed.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until MinhashSeeds.size).map(i => col(s"mh_$i")): _*).as("sig"))
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
    val sigs = minhashSignatures(docs, n, idCol, textCol).cache()

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
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
    // 60-bit hash: first 15 md5 hex chars
    val hashed = toks.withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bits = hashed.select(
      col(idCol),
      explode(sequence(lit(0), lit(59))).as("bit"),
      col("h"))
      .withColumn("vote", when(expr("shiftright(h, CAST(bit AS INT)) & 1") === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
    bits
      .withColumn("bitval", when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).otherwise(lit(0L)))
      .groupBy(col(idCol))
      .agg(sum(col("bitval")).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming. All-pairs
    * at test scale; at 100 TB the standard block-permuted index (split the
    * 60 bits into maxHamming+1 blocks, join on exact block match) bounds the
    * candidate set the same lossless way the Jaccard prefix filter does.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val a = sh.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"))
    val b = sh.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
  }
}
