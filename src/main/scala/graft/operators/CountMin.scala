package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** Count-min sketch as a RELATION: `(row, bucket, cnt)` cells, `depth ×
  * width` rows total regardless of corpus size — the third mergeable
  * summary in the engine (HLL registers for distincts, binned histograms
  * for quantiles, count-min cells for frequencies). Shards sketch locally
  * and MERGE BY BUCKET ADDITION (one `depth·width`-row shuffle per shard),
  * which is the entire 100 TB story: frequency estimates over any
  * partitioning of the corpus combine without rescanning it.
  *
  * Estimates carry the classic one-sided guarantee: `est >= true` always
  * (hash collisions only ADD), and `est - true <= ε·N` with high
  * probability for ε ≈ e/width. Both facts are asserted per query token in
  * the `top_tokens_cms` query rather than taken on faith.
  *
  * Fully deterministic: bucket indices derive from the md5-based
  * [[TextKernels.hash32Col]] over a row-salted token (`cms<row>_<token>`),
  * so a SQL engine can rebuild the identical sketch cell-by-cell and the
  * whole estimate table replays exactly — no tolerance band, unlike the
  * HLL path whose per-register hashing is JVM-internal.
  */
object CountMin {

  /** Sketch geometry: 4 independent rows × 256 buckets. Collision rate on
    * a V-token vocabulary is ~V/width per row; estimates take the min over
    * rows, so error decays geometrically in depth.
    */
  val Depth = 4
  val Width = 256

  /** One output row per sketch row: `explode` of the literal row range —
    * codegen'd and map-side.
    */
  private def rowIds: Column = explode(array((0 until Depth).map(lit): _*))

  private def bucketOf(row: Column, item: Column): Column =
    pmod(TextKernels.hash32Col(concat(lit("cms"), row, lit("_"), item)), lit(Width.toLong))

  /** Per-group sketch cells: (groupCols..., row, bucket, cnt). The
    * aggregation is the only shuffle and its output is `depth·width` rows
    * per group — a mergeable shard summary.
    */
  def sketch(items: DataFrame, itemCol: String, groupCols: Seq[String] = Nil): DataFrame = {
    val it = col(itemCol)
    val withCells = items
      .withColumn("row", rowIds)
      .withColumn("bucket", bucketOf(col("row"), it))
    withCells
      .groupBy((groupCols.map(col) :+ col("row")) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge per-group sketches into one by bucket addition — the rollup
    * direction (shard → global, day → week). Input must carry
    * (row, bucket, cnt).
    */
  def merge(sketches: DataFrame): DataFrame =
    sketches
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** SKETCH INNER PRODUCT — the classic CMS join-size estimator
    * (Cormode–Muthukrishnan '05 §4.2): for two sketches built on the
    * JOIN KEY of relations A and B, `Σ_b cntA[r,b]·cntB[r,b]` per row
    * OVERESTIMATES the true `Σ_k cA(k)·cB(k) = |A ⋈ B|` (collisions
    * only add mass), and the min over the depth rows is the estimate —
    * join cardinality predicted from two `depth×width` summaries without
    * touching either relation again. The 100 TB use is PLANNING: join
    * order and strategy chosen from sketch cells instead of a scan, the
    * same cells the frequency estimates already maintain. Output: one
    * row `(est)`; cost is a `depth·width`-row join, metadata-sized.
    */
  def innerProduct(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("row"), col("bucket"), col("cnt").as("ca"))
      .join(b.select(col("row"), col("bucket"), col("cnt").as("cb")),
        Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est"))

  /** Point estimates: min over rows of the queried item's bucket counts.
    * `queries` carries `itemCol`; items absent from the sketch estimate as
    * the collision mass of their buckets (>= 0), never null.
    * Output: (itemCol, est).
    */
  def estimate(sketch: DataFrame, queries: DataFrame, itemCol: String): DataFrame = {
    val it = col(itemCol)
    val probes = queries
      .withColumn("row", rowIds)
      .withColumn("bucket", bucketOf(col("row"), it))
    probes
      .join(sketch, Seq("row", "bucket"), "left")
      .groupBy(it)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
