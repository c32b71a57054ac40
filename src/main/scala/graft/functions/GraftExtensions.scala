package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SparkSessionExtensions injector for every graft Catalyst expression —
  * the spark-submit integration point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * makes `graft_dot`, `graft_vec_sum`, `graft_vec_min`/`graft_vec_max`,
  * `graft_shingles`, `graft_minhash`, `graft_simhash60`, `graft_winnow`,
  * `graft_repstats` and `graft_bpe_apply` available to every session (SQL
  * included) without any library call. The operators themselves still lazily register via
  * [[VectorFunctions.register]]/[[TextKernels.register]] so plain sessions
  * (Verify, Bench, tests, notebooks) keep working; this class is the
  * cluster-deployment path where the functions should exist before user code
  * runs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // maintenance-verb SQL (OPTIMIZE / VACUUM / DESCRIBE HISTORY over
    // snapshot-log tables) — a delegating parser, never shadowing real
    // grammar ([[graft.sources.GraftSqlParser]])
    ext.injectParser((_, delegate) => new graft.sources.GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist_l"),
      info("graft_sqdist_l", "graft_sqdist_l(a, b) - codegen'd integer squared-L2 distance of two array<bigint>"),
      (exprs: Seq[Expression]) => SqDistLong(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_eq_count"),
      info("graft_eq_count", "graft_eq_count(a, b) - codegen'd equal-slot count of two array<bigint>"),
      (exprs: Seq[Expression]) => EqSlotCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, n) - distinct word n-grams"),
      (exprs: Seq[Expression]) =>
        TextKernels.ShinglesExpr(exprs(0), TextKernels.intArg("graft_shingles", 1, exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(grams) - 32-slot MinHash signature"),
      (exprs: Seq[Expression]) => TextKernels.MinHashSignature(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      info("graft_simhash60", "graft_simhash60(tokens) - 60-bit SimHash"),
      (exprs: Seq[Expression]) => TextKernels.SimHash60(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(tokens, n, w) - winnowing fingerprints"),
      (exprs: Seq[Expression]) => TextKernels.WinnowFingerprints(
        exprs(0),
        TextKernels.intArg("graft_winnow", 1, exprs(1)),
        TextKernels.intArg("graft_winnow", 2, exprs(2)))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      info("graft_vec_sum", "graft_vec_sum(v) - element-wise sum aggregate over array<double>"),
      (exprs: Seq[Expression]) => VectorSumAgg(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_min"),
      info("graft_vec_min", "graft_vec_min(v) - element-wise min aggregate over array<double>"),
      (exprs: Seq[Expression]) => VectorExtremeAgg(exprs(0), isMin = true)))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_max"),
      info("graft_vec_max", "graft_vec_max(v) - element-wise max aggregate over array<double>"),
      (exprs: Seq[Expression]) => VectorExtremeAgg(exprs(0), isMin = false)))
    ext.injectFunction((
      FunctionIdentifier("graft_repstats"),
      info("graft_repstats",
        "graft_repstats(tokens, n) - struct<n_grams, n_distinct, top_count> repetition stats"),
      (exprs: Seq[Expression]) => TextKernels.RepetitionStats(
        exprs(0), TextKernels.intArg("graft_repstats", 1, exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_apply"),
      info("graft_bpe_apply",
        "graft_bpe_apply(word, merges) - subword segmentation under a flattened (l1,r1,l2,r2,...) merge table literal"),
      (exprs: Seq[Expression]) => TextKernels.BpeApply(
        exprs(0), TextKernels.stringArrayArg("graft_bpe_apply", 1, exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk",
        "graft_topk(item, score, k) - bounded (score DESC, item ASC) top-k aggregate, best-first array<struct<item,score>>"),
      (exprs: Seq[Expression]) => TopKAgg(exprs(0), exprs(1), TopKFunctions.kArg(exprs))))
    ext.injectFunction((
      FunctionIdentifier("graft_mg"),
      info("graft_mg",
        "graft_mg(item, k) - Misra-Gries heavy-hitters summary, (est DESC, item ASC) array<struct<item,est>>"),
      (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0), FreqFunctions.kArg(exprs))))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      info("graft_gram_hashes", "graft_gram_hashes(tokens, n) - ordered 32-bit n-gram hash sequence"),
      (exprs: Seq[Expression]) => TextKernels.OrderedGramHashes(
        exprs(0), TextKernels.intArg("graft_gram_hashes", 1, exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(s) - Unicode NFC normalization"),
      (exprs: Seq[Expression]) => TextKernels.NfcNormalize(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_media_header"),
      info("graft_media_header",
        "graft_media_header(payload) - PNG/JPEG/WAV container-header sniff to struct"),
      (exprs: Seq[Expression]) => MediaKernels.DecodeMediaHeader(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_ppm_dhash"),
      info("graft_ppm_dhash", "graft_ppm_dhash(payload) - 64-bit perceptual dHash of a PPM image"),
      (exprs: Seq[Expression]) => ImageKernels.PpmDhash(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_wav_ehash"),
      info("graft_wav_ehash", "graft_wav_ehash(payload) - 64-bit energy-envelope hash of a PCM WAV"),
      (exprs: Seq[Expression]) => AudioKernels.WavEnergyHash(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_frames"),
      info("graft_gif_frames",
        "graft_gif_frames(payload) - GIF container walk to struct<width,height,n_frames,total_delay_cs,delays_cs>"),
      (exprs: Seq[Expression]) => VideoKernels.GifFrames(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_sketch"),
      info("graft_theta_sketch", "graft_theta_sketch(key, lgK) - theta sketch aggregate"),
      (exprs: Seq[Expression]) => ThetaFunctions.ThetaSketchAgg(
        exprs(0), ThetaFunctions.lgKArg("graft_theta_sketch", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_union"),
      info("graft_theta_union", "graft_theta_union(sk, lgK) - theta sketch union aggregate"),
      (exprs: Seq[Expression]) => ThetaFunctions.ThetaUnionAgg(
        exprs(0), ThetaFunctions.lgKArg("graft_theta_union", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_estimate"),
      info("graft_theta_estimate", "graft_theta_estimate(sk) - distinct estimate of a theta sketch"),
      (exprs: Seq[Expression]) => ThetaFunctions.ThetaEstimate(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect_est"),
      info("graft_theta_intersect_est", "graft_theta_intersect_est(a, b) - intersection estimate"),
      (exprs: Seq[Expression]) => ThetaFunctions.ThetaIntersectEstimate(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_anotb_est"),
      info("graft_theta_anotb_est", "graft_theta_anotb_est(a, b) - A-not-B estimate"),
      (exprs: Seq[Expression]) => ThetaFunctions.ThetaANotBEstimate(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_sketch"),
      info("graft_kll_sketch", "graft_kll_sketch(v, k) - KLL quantile sketch aggregate"),
      (exprs: Seq[Expression]) => KllFunctions.KllSketchAgg(
        exprs(0), KllFunctions.kArg("graft_kll_sketch", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_merge"),
      info("graft_kll_merge", "graft_kll_merge(sk, k) - KLL sketch merge aggregate"),
      (exprs: Seq[Expression]) => KllFunctions.KllMergeAgg(
        exprs(0), KllFunctions.kArg("graft_kll_merge", exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_quantile"),
      info("graft_kll_quantile", "graft_kll_quantile(sk, q) - quantile estimate from a KLL sketch"),
      (exprs: Seq[Expression]) => KllFunctions.KllQuantile(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_agg"),
      info("graft_bitmap_agg", "graft_bitmap_agg(id) - exact roaring-style bitmap aggregate over dense ids"),
      (exprs: Seq[Expression]) => BitmapFunctions.BitmapBuildAgg(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_union"),
      info("graft_bitmap_union", "graft_bitmap_union(bm) - bitwise-OR rollup aggregate over bitmaps"),
      (exprs: Seq[Expression]) => BitmapFunctions.BitmapUnionAgg(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_count"),
      info("graft_bitmap_count", "graft_bitmap_count(bm) - exact cardinality"),
      (exprs: Seq[Expression]) => BitmapFunctions.BitmapCount(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_and_count"),
      info("graft_bitmap_and_count", "graft_bitmap_and_count(a, b) - exact |A intersect B|"),
      (exprs: Seq[Expression]) => BitmapFunctions.BitmapAndCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_andnot_count"),
      info("graft_bitmap_andnot_count", "graft_bitmap_andnot_count(a, b) - exact |A minus B|"),
      (exprs: Seq[Expression]) => BitmapFunctions.BitmapAndNotCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(key, m, k) - bloom filter aggregate"),
      (exprs: Seq[Expression]) => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(bloom, key) - membership probe"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
