package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministically-trained linear (logistic) classifier — the learned
  * quality / domain / language filter of a training-data pipeline (CCNet's
  * and GPT-3's quality filters are linear classifiers over cheap document
  * features; fastText's supervised mode is the same shape). Full-batch
  * gradient descent from zero weights, with every iteration's update
  * quantized to 6 decimals IN THE PLAN (Spark `round` == DuckDB `round`,
  * both half-away-from-zero), so the entire iterative float fit replays
  * bitwise in a DuckDB oracle as an unrolled CTE chain — the
  * [[Similarity.kmeans]] per-iteration-quantization trick. The one libm
  * call is `exp` inside the training sigmoid (not correctly-rounded IEEE,
  * so the two engines may differ by 1 ulp per row) — ~10 orders of
  * magnitude below the 6-decimal update quantization that absorbs it.
  * Scoring avoids transcendentals entirely: the decision value is the raw
  * margin z = w·x (sign(z) == sigmoid(z) > 0.5), a fixed-order dot of
  * identical doubles in both engines.
  *
  * Scale shape: one aggregation job per iteration — `dim` codegen'd `avg`s
  * with map-side partials, `dim` doubles per task through the shuffle —
  * and the driver touches one dim-wide row per iteration. Scoring is
  * map-side with the weights as plan literals. The feature frame is
  * consumed `iters` times: pass a persisted frame for real corpora (the
  * declared query does — at 100 TB recomputing the feature scan per
  * iteration would dominate, the kmeans lesson).
  */
object Classifier {

  /** Fit logistic weights over `featCols` (label in [0,1] in `labelCol`):
    * w_j ← round(w_j - lr · avg((σ(w·x) - y) · x_j), 6) per iteration.
    * Returns one weight per feature column, in `featCols` order. Callers
    * wanting a bias term include a literal-1.0 feature column.
    */
  def trainLogreg(
      feats: DataFrame,
      featCols: Seq[String],
      labelCol: String,
      iters: Int,
      lr: Double): Array[Double] = {
    require(featCols.nonEmpty, "trainLogreg: need at least one feature column")
    require(iters > 0, s"trainLogreg: iters must be positive, got $iters")
    require(lr > 0, s"trainLogreg: lr must be positive, got $lr")
    var w = Array.fill(featCols.size)(0.0)
    (1 to iters).foreach { _ =>
      val err = lit(1.0) / (lit(1.0) + exp(-margin(featCols, w.toSeq))) - col(labelCol)
      val updated = featCols.zipWithIndex.map { case (c, j) =>
        round(lit(w(j)) - lit(lr) * avg(err * col(c)), 6).as(s"w$j")
      }
      val row = feats.agg(updated.head, updated.tail: _*).collect()(0)
      w = Array.tabulate(w.length)(j => row.getDouble(j))
    }
    w
  }

  /** Per-column z-score standardization — the step that makes full-batch GD
    * converge in tens of iterations when raw features live on wildly
    * different scales (tiny-margin ratios vs a literal-1 bias). Statistics
    * are 6-decimal quantized (round(avg), round(stddev_pop)) and the
    * standardized values re-quantized, so the transform replays exactly in
    * the oracle; a constant column (stddev 0) centers to zero with divisor
    * 1 rather than NaN-ing. One dim-wide aggregation job; the stats ride
    * the transform as plan literals. Returns the transformed frame plus the
    * per-column (mean, std) actually used — apply the same literals to
    * score NEW batches with a trained model.
    */
  def standardize(
      feats: DataFrame,
      featCols: Seq[String]): (DataFrame, Seq[(Double, Double)]) = {
    require(featCols.nonEmpty, "standardize: need at least one feature column")
    val aggs = featCols.flatMap(c =>
      Seq(round(avg(col(c)), 6).as(s"m_$c"), round(stddev_pop(col(c)), 6).as(s"s_$c")))
    val row = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
    val stats = featCols.indices.map { j =>
      require(!row.isNullAt(2 * j) && !row.isNullAt(2 * j + 1),
        s"standardize: empty input or all-null column '${featCols(j)}'")
      val s = row.getDouble(2 * j + 1)
      (row.getDouble(2 * j), if (s == 0.0) 1.0 else s)
    }
    val out = featCols.zip(stats).foldLeft(feats) { case (d, (c, (m, s))) =>
      d.withColumn(c, round((col(c) - lit(m)) / lit(s), 6))
    }
    (out, stats)
  }

  /** The decision margin z = w·x with the weights as plan literals —
    * left-to-right over `featCols`, the fixed evaluation order the oracle
    * mirrors term-for-term.
    */
  def margin(featCols: Seq[String], weights: Seq[Double]): Column = {
    require(featCols.size == weights.size,
      s"margin: ${featCols.size} features vs ${weights.size} weights")
    featCols.zip(weights).map { case (c, wj) => col(c) * lit(wj) }.reduce(_ + _)
  }
}
