package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd dot product of two array<double>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
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
  }
}
