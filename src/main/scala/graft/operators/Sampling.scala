package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling/splitting — the reproducible
  * train/validation/test assignment a training-data pipeline needs.
  *
  * `df.sample()`/`sampleBy()` are seed-reproducible only within one Spark
  * version+partitioning (the RNG is per-partition, so a repartition changes
  * the sample), and no other engine can replay them. Hashing the KEY
  * instead gives a sample that is a pure function of the data: stable
  * across runs, partitionings, engines (DuckDB replays the same md5
  * arithmetic), and incremental loads — a document keeps its split forever,
  * the property that prevents train/test leakage when the corpus grows.
  * Map-side only; no shuffle, no RNG state.
  */
object Sampling {

  /** Uniform-ish value in [0, 1) from the md5 of the key's string form —
    * first 8 hex digits as a 32-bit integer over 2^32. ~Uniform because md5
    * bits are; deterministic because md5 is.
    */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") / lit(4294967296.0)

  /** Assign each row a split label by cumulative fraction thresholds over
    * [[hashUniform]] — e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" ->
    * 0.1)`. Fractions must sum to 1 (±1e-9); every row gets exactly one
    * label. A NULL key is rejected at runtime (`raise_error`): it has no
    * stable identity to hash, and silently lumping null-keyed rows into one
    * split would be exactly the hidden skew this operator exists to prevent.
    */
  def withHashSplit(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0),
      s"every fraction must be positive, got $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(!df.columns.contains(splitCol), s"input already has a $splitCol column")
    val u = hashUniform(col(keyCol))
    val cut = fractions.scanLeft(0.0)(_ + _._2).tail
    val label = fractions.zip(cut).init.foldRight(lit(fractions.last._1): Column) {
      case (((name, _), hi), rest) => when(u < hi, lit(name)).otherwise(rest)
    }
    df.withColumn(
      splitCol,
      when(col(keyCol).isNull,
        raise_error(lit(s"withHashSplit: NULL $keyCol — a null key has no stable split identity")))
        .otherwise(label))
  }

  /** Deterministic per-stratum downsampling — the corpus-MIXING step: keep a
    * row iff `hashUniform(key) < fraction(stratum)`, thinning
    * over-represented strata (a dominant language, a crawl domain) to target
    * rates while the rest pass through. Same identity guarantees as
    * [[withHashSplit]]: membership is a pure function of the key, stable
    * across runs, partitionings, engines, and corpus growth — and because
    * the threshold test is monotone in the fraction, raising a stratum's
    * rate only ADDS documents (nested samples), never reshuffles the kept
    * set. Map-side only (literal-map lookup + md5 compare); no shuffle, no
    * RNG. Strata absent from `fractions` (and NULL strata) keep
    * `defaultFraction`; NULL keys are rejected at runtime like
    * [[withHashSplit]].
    */
  /** Temperature-scaled mixture weights per stratum — the knob that decides
    * how much each source/domain/language contributes to a training mix
    * (upsampling the tail relative to raw proportions, the standard
    * multilingual/multi-domain recipe). Temperature is FIXED at α = 0.5,
    * computed as `sqrt(n_s / N)`: sqrt is correctly rounded under IEEE 754
    * so both engines produce the identical double, whereas a general
    * `pow(p, α)` is NOT portable across libm implementations — the repo's
    * cross-engine determinism discipline picks the portable special case.
    * Output is an integer propensity in parts-per-million (consumers
    * normalize across the strata they actually mix); all other columns are
    * exact integers.
    *
    * Scale shape: one partially-aggregated count per stratum (map-side
    * combine → ≤ strata rows per task), a 1-row scalar broadcast for the
    * total, and the arithmetic on strata-cardinality rows — nothing here
    * touches data volume again.
    */
  def mixtureWeights(
      docs: DataFrame,
      strataCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val per = docs
      .select(col(strataCol), size(TextAnalysis.tokens(col(textCol))).cast("long").as("nt"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total_tokens"))
    per.crossJoin(broadcast(tot))
      .select(
        col(strataCol), col("n_docs"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double") / col("total_tokens").cast("double"))
          * lit(1e6)).cast("long").as("weight_ppm"))
  }

  def hashSampleByStratum(
      df: DataFrame,
      keyCol: String,
      stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    require((defaultFraction +: fractions.values.toList).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must lie in [0, 1], got $fractions (default $defaultFraction)")
    val lookup = map(
      fractions.toSeq.sorted.flatMap { case (k, f) => Seq(lit(k), lit(f)) }: _*)
    val frac = coalesce(element_at(lookup, stratum.cast("string")), lit(defaultFraction))
    df.where(
      when(col(keyCol).isNull,
        raise_error(lit(s"hashSampleByStratum: NULL $keyCol — a null key has no stable identity")))
        .otherwise(hashUniform(col(keyCol)) < frac))
  }
}
