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
}
