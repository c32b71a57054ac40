package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composite every LLM training-data
  * pipeline runs: keep documents that are (a) decent quality, (b) the target
  * language by the marker heuristic, and (c) the representative (minimum id)
  * of their near-duplicate component AMONG THE MEMBERS THAT PASS (a) and
  * (b). The representative is chosen after filtering, not before: if a
  * cluster's global min-id member is junk, the cluster still contributes its
  * best-surviving twin instead of silently vanishing from the corpus.
  *
  * The near-dup PAIRS frame is a parameter, not a hardcoded route: the
  * caller picks the candidate generator that fits the corpus —
  * [[Dedup.ngramJaccardPairs]] (lossless, ground truth; candidate volume
  * degenerates toward all-pairs at low thresholds) for validation runs,
  * [[Dedup.ngramJaccardPairsViaMinhash]] (banded candidates, O(true-ish
  * pairs)) as the 100 TB route, or any other (doc_a, doc_b) frame
  * ([[Dedup.simhashPairs]], embedding near-dups joined back to doc ids).
  * r3 hardwired the lossless route into the flagship pipeline — exactly the
  * scale-killer the generator parameter removes.
  *
  * Plan shape: the scoring leg is a map-only projection chain (tokenize
  * once, score columns staged as real attributes so the language argmax
  * doesn't re-evaluate them per branch); the dedup leg resolves pairs →
  * groups via [[Dedup.connectedComponents]]; one join ties them together,
  * the quality/language filter prunes BEFORE the representative window (so
  * the extra shuffle partitioned on component_id carries only survivors),
  * and the min-id-over-component window picks one row per surviving group.
  */
object Curation {

  def curateCorpus(
      docs: DataFrame,
      pairs: DataFrame,
      minQuality: Double = 0.5,
      lang: String = "en",
      idCol: String = "doc_id",
      textCol: String = "text",
      checkpointDir: Option[String] = None): DataFrame = {
    val staged = docs.select(
      col(idCol), col(textCol).as("text"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val scored = staged.select(
      col(idCol) +:
        round(TextAnalysis.qualityScoreOf(col("text"), col("toks")), 6).as("quality") +:
        TextAnalysis.langScores(col("toks")).map { case (l, sc) => sc.as(s"s_$l") }: _*)
    val scoreRefs = TextAnalysis.LangMarkers.map { case (l, _) => l -> col(s"s_$l") }
    val labeled = scored.select(
      col(idCol), col("quality"),
      TextAnalysis.langIdFromScores(scoreRefs).as("lang_guess"))
    val comps = Dedup.connectedComponents(
      docs, pairs, idCol = idCol, checkpointDir = checkpointDir)
    val surviving = labeled.join(comps, idCol)
      .where(col("quality") >= minQuality && col("lang_guess") === lang)
    val repWindow = Window.partitionBy(col("component_id"))
    surviving
      .withColumn("rep_id", min(col(idCol)).over(repWindow))
      .where(col(idCol) === col("rep_id"))
      .select(col(idCol), col("quality"))
  }

  /** (strataCol, idCol, n_tokens, quality) — the shared scoring stage of the
    * budget selectors: tokenize once, integer token counts, quality rounded
    * to the repo-wide 6 decimals BEFORE any ordering depends on it (so the
    * ordering is over values both engines agree on bit-for-bit).
    * Empty/whitespace docs are excluded — they have no tokens to budget and
    * their quality ratios are 0/0.
    */
  private def scoredForBudget(
      docs: DataFrame, strataCol: String, idCol: String, textCol: String): DataFrame =
    docs
      .where(length(TextAnalysis.normalize(col(textCol))) > 0)
      .select(col(strataCol), col(idCol), col(textCol).as("text"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(
        col(strataCol), col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        round(TextAnalysis.qualityScoreOf(col("text"), col("toks")), 6).as("quality"))

  /** Greedy token-budget selection per stratum — the data-mixing step every
    * budgeted training run makes: each stratum (source, domain, language)
    * contributes its best documents, quality-first, until its token budget
    * is exhausted. Selection is the maximal prefix of the (quality DESC,
    * id) order whose running token sum stays within `budgetTokens`;
    * deterministic because the order is total and every quantity is an
    * integer or a 6-decimal-rounded double.
    *
    * This EXACT variant needs a full per-stratum sort inside the window —
    * one exchange on `strataCol`, which at 100 TB means few huge partitions
    * (the classic low-cardinality window skew). It is the ground-truth
    * sibling; [[budgetSelectBinned]] is the scale route (mergeable histogram
    * cutoff, no per-stratum sort), with the subset law pinned in
    * CurationSpec.
    */
  def budgetSelect(
      docs: DataFrame,
      budgetTokens: Long,
      strataCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("quality").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scoredForBudget(docs, strataCol, idCol, textCol)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
  }

  /** The scale route for [[budgetSelect]]: quantize quality into `nBins`
    * equal cells, build a per-(stratum, bin) token histogram (a tiny
    * mergeable aggregate — map-side combine leaves ≤ strata·bins partial
    * rows per task, the [[Histograms]] shape), take whole bins best-first
    * while the running total fits the budget, and keep the docs of kept
    * bins with one map-side semi-join against the broadcast cutoff. No
    * per-stratum sort anywhere, so the low-cardinality window skew of the
    * exact variant never appears.
    *
    * Under-fills by at most one bin's tokens (the first bin that would
    * overflow is dropped whole): because bin boundaries are strict quality
    * boundaries, the kept set is a PREFIX of the exact variant's order, so
    * `binned ⊆ exact` for the same budget — the law CurationSpec pins.
    */
  def budgetSelectBinned(
      docs: DataFrame,
      budgetTokens: Long,
      nBins: Int = 100,
      strataCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val scored = scoredForBudget(docs, strataCol, idCol, textCol)
      .withColumn("bin", least(floor(col("quality") * nBins).cast("long"), lit(nBins - 1L)))
    val hist = scored.groupBy(col(strataCol), col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    val cumW = Window.partitionBy(col(strataCol))
      .orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = hist
      .withColumn("cum_tokens", sum(col("bin_tokens")).over(cumW))
      .where(col("cum_tokens") <= budgetTokens)
      .select(col(strataCol), col("bin"))
    scored.join(broadcast(kept), Seq(strataCol, "bin"))
      .select(col(strataCol), col(idCol), col("n_tokens"), col("quality"))
  }
}
