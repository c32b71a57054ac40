package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy scrubbing for training-data export — the pass a pipeline runs
  * before raw interaction logs may feed a training corpus: direct
  * identifiers become salted surrogate keys, quasi-identifying timestamps
  * are generalized to a coarser bucket, and free-text payloads get pattern
  * redaction with an audit count per row.
  *
  * Everything is a pure column expression (codegen'd, no UDFs), so the
  * whole scrub is ONE map-side pass at any scale — no shuffle, no state.
  * Determinism is the point of the salted-hash design: the same user maps
  * to the same pseudonym across batches and engines (joins on the
  * pseudonym still work downstream), while reversing it needs the salt.
  */
object Privacy {

  /** Digit runs — numeric payloads (amounts, ids, zips) inside free text. */
  val NumberPattern = "[0-9]+"

  /** Email addresses (the pragmatic pattern, not full RFC 5322). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** http/https URLs up to whitespace. */
  val UrlPattern = "https?://[^\\s]+"

  /** Salted deterministic surrogate key: md5("&lt;salt&gt;:&lt;key&gt;").
    * Same key + salt → same pseudonym everywhere (cross-batch joins keep
    * working); rotating the salt unlinks every historical export at once.
    */
  def pseudonymize(key: Column, salt: String): Column =
    md5(concat(lit(salt + ":"), key.cast("string")))

  /** Replace every match of `pattern` with `token`. */
  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** How many matches [[redact]] would replace — the per-row audit column
    * a scrub job emits alongside the cleaned text.
    */
  def redactionCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** The multi-class PII taxonomy a corpus scrub detects and masks:
    * (class, pattern, mask token), in MASKING ORDER — email first so a
    * later digit-class can never fire inside an address it should have
    * consumed whole. Patterns are deliberately RE2-safe (no backrefs, no
    * lookaround) so the same regex text runs identically on Spark's Java
    * engine and any RE2-class engine an oracle replays on.
    */
  val PiiClasses: Seq[(String, String, String)] = Seq(
    ("email", EmailPattern, "<EMAIL>"),
    ("phone", "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("idnum", "\\b\\d{9,16}\\b", "<ID>"))

  /** MULTI-CLASS PII SCAN + MASK (the pre-training corpus scrub every
    * LLM pipeline runs): per row, one audit count per [[PiiClasses]]
    * class (`n_email`, `n_phone`, `n_ipv4`, `n_idnum` — counted on the
    * ORIGINAL text, word-boundary anchored so a digit run inside a
    * larger token never double-counts) plus the fully masked text
    * (`<textCol>_masked`) with classes replaced in taxonomy order.
    *
    * Pure codegen'd column expressions — one map-side pass, no shuffle,
    * no UDFs — so the scan runs at scan speed over 100 TB of text.
    */
  def piiScan(df: DataFrame, textCol: String): DataFrame = {
    val counted = PiiClasses.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", redactionCount(col(textCol), pat))
    }
    val masked = PiiClasses.foldLeft(col(textCol)) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    counted.withColumn(s"${textCol}_masked", masked)
  }

  /** Timestamp generalized to its hour bucket, as epoch SECONDS — integer
    * math end to end (floor-epoch minus its mod-3600 remainder), the
    * repo-wide cross-engine determinism discipline for time outputs.
    */
  def hourBucketSec(ts: Column): Column = {
    val sec = unix_timestamp(ts)
    (sec - pmod(sec, lit(3600L))).cast("long")
  }

  /** The composed scrub over an interaction-log frame shaped like the
    * `events` table: surrogate user key, hour-generalized timestamp,
    * numeric redaction over the free-text properties payload, audit count.
    */
  def scrubEvents(events: DataFrame, salt: String = "graft"): DataFrame =
    events.select(
      col("event_id"),
      pseudonymize(col("user_id"), salt).as("user_pseudo"),
      hourBucketSec(col("ts")).as("ts_hour_sec"),
      col("event_type"),
      redact(col("props"), NumberPattern, "<NUM>").as("props_clean"),
      redactionCount(col("props"), NumberPattern).as("n_redacted"))

  /** Right-to-be-forgotten purge over a partitioned table: remove every row
    * whose `keyCol` appears in `subjects`, rewriting ONLY the partitions
    * that contain such rows — the erasure-request shape (GDPR art. 17 /
    * CCPA deletion) a 100 TB log store must serve without rewriting the
    * whole table.
    *
    * Three bounded passes:
    *  1. DISCOVERY — a column-pruned scan (only `keyCol` + the partition
    *     key reach the parquet reader) semi-joined against the broadcast
    *     subject set yields the touched partition values; untouched
    *     partitions are never read again.
    *  2. REWRITE — the touched partitions (partition-pruned scan) anti-join
    *     the subjects and dynamic-partition-overwrite in place (the
    *     [[graft.sources.TableManager]] idempotent-load path).
    *  3. SWEEP — a partition whose EVERY row belonged to subjects emits no
    *     rows, so dynamic overwrite cannot touch it; those are dropped as
    *     units via ALTER TABLE DROP PARTITION.
    *
    * Returns the touched partition values ascending; a second run with the
    * same subjects returns empty (idempotent — the audit re-check is free).
    * The subject set is assumed driver-bounded (an erasure queue, not a
    * fact table); for fact-scale purges use an anti-join rewrite of the
    * whole table instead.
    */
  def forgetUsers(
      spark: org.apache.spark.sql.SparkSession,
      table: graft.sources.TableManager,
      keyCol: String,
      partitionKey: String,
      subjects: DataFrame): Seq[String] = {
    val subj = broadcast(subjects.select(col(keyCol)).distinct())
    val touched = table.read(spark)
      .join(subj, Seq(keyCol), "left_semi")
      .select(col(partitionKey).cast("string").as("pv")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (touched.nonEmpty) {
      // Materialize the survivors BEFORE the overwrite: the rewrite reads
      // the very files it replaces, so the plan must not re-scan the table
      // mid-write. localCheckpoint bounds the staged data to the touched
      // partitions' survivors; a production purge stages to a scratch
      // location (or a transactional table format) and swaps — same shape.
      val purged = table.read(spark)
        .where(col(partitionKey).cast("string").isin(touched: _*))
        .join(subj, Seq(keyCol), "left_anti")
        .localCheckpoint()
      val kept = purged
        .select(col(partitionKey).cast("string").as("pv")).distinct()
        .collect().map(_.getString(0)).toSet
      table.overwritePartitions(spark, purged)
      table.dropPartitions(spark, partitionKey, touched.filterNot(kept))
    }
    touched
  }

  /** k-ANONYMITY AUDIT (Sweeney 2002, the published re-identification
    * model): group rows by their quasi-identifier tuple and report every
    * EQUIVALENCE CLASS smaller than `k` — each such class is a set of
    * rows an adversary who knows the quasi values can narrow to fewer
    * than k candidates. One aggregation, output bounded by the number of
    * violating classes (never row count). Columns: the quasi columns +
    * `class_size`, ascending by class for a stable report.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[(String, Column)], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymityAudit: at least one quasi-identifier required")
    require(k >= 2, s"kAnonymityAudit: k must be >= 2, got $k")
    val named = quasiCols.map { case (n, c) => c.as(n) }
    df.select(named: _*)
      .groupBy(quasiCols.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
      .orderBy(quasiCols.map(q => col(q._1)) :+ col("class_size"): _*)
  }

  /** k-anonymity by SUPPRESSION: rows in violating classes get their
    * quasi columns NULLed (full-tuple suppression, the baseline
    * k-anonymization every generalization scheme is measured against);
    * compliant rows pass untouched. One audit aggregation + one
    * broadcast-friendly anti-pattern join on the quasi tuple — the
    * violating-class frame is small by definition (each class < k rows),
    * so the join's build side is the report, not the data.
    */
  /** DISTINCT l-DIVERSITY audit (Machanavajjhala et al. 2007) — the
    * homogeneity check k-anonymity misses: a class can hold ≥ k rows and
    * still leak the sensitive attribute outright when every row carries
    * the SAME sensitive value. A class is l-diverse iff it contains at
    * least `l` distinct sensitive values; the audit returns the violating
    * classes with their size and diversity (the re-identification risk
    * report a release gate reads AFTER the k-audit passes).
    *
    * Distinct l-diversity is the exact-integer member of the family
    * (entropy/recursive variants need logs); one quasi-keyed aggregation
    * with a distinct count — the same shuffle shape as the k-audit, and
    * the violating frame is output-sized, never data-sized.
    */
  def lDiversityAudit(
      df: DataFrame,
      quasiCols: Seq[(String, Column)],
      sensitiveCol: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversityAudit: at least one quasi-identifier required")
    require(l >= 2, s"lDiversityAudit: l must be >= 2, got $l")
    val named = quasiCols.map { case (n, c) => c.as(n) } :+ sensitiveCol.as("__sens")
    df.select(named: _*)
      .groupBy(quasiCols.map(q => col(q._1)): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col("__sens")).as("n_sensitive"))
      .where(col("n_sensitive") < l)
      .orderBy(quasiCols.map(q => col(q._1)): _*)
  }

  /** Inverse-CDF thresholds of the TRUNCATED two-sided geometric
    * (discrete Laplace) with α = 1/2 — the ε = ln 2 geometric mechanism
    * for sensitivity-1 counting queries: P(k) = (1/3)·(1/2)^|k|, tail
    * mass beyond |k| = 16 folded onto the endpoints (< 1.1e-5 — the
    * truncation every practical integer sampler applies). EXACT integer
    * rationals scaled by 2^32, computed once offline: a 32-bit hash draw
    * `h` maps to the first k with h < threshold — pure integer
    * comparisons, so both engines sample the identical noise from the
    * identical seed with zero float involvement.
    */
  private[graft] val DpGeomThresholds: Seq[(Int, Long)] = Seq(
    -16 -> 43690L, -15 -> 87381L, -14 -> 174762L, -13 -> 349525L,
    -12 -> 699050L, -11 -> 1398101L, -10 -> 2796202L, -9 -> 5592405L,
    -8 -> 11184810L, -7 -> 22369621L, -6 -> 44739242L, -5 -> 89478485L,
    -4 -> 178956970L, -3 -> 357913941L, -2 -> 715827882L, -1 -> 1431655765L,
    0 -> 2863311530L, 1 -> 3579139413L, 2 -> 3937053354L, 3 -> 4116010325L,
    4 -> 4205488810L, 5 -> 4250228053L, 6 -> 4272597674L, 7 -> 4283782485L,
    8 -> 4289374890L, 9 -> 4292171093L, 10 -> 4293569194L, 11 -> 4294268245L,
    12 -> 4294617770L, 13 -> 4294792533L, 14 -> 4294879914L, 15 -> 4294923605L,
    16 -> 4294967296L)

  /** ε = ln 2 DIFFERENTIALLY-PRIVATE noisy counts (the geometric
    * mechanism over a GROUP BY): each group's true count gets integer
    * discrete-Laplace noise drawn from a SEEDED hash of its group key —
    * deterministic on purpose here so the oracle can replay the release
    * bit-for-bit (the verification discipline of this repo); a
    * production release swaps the seeded draw for a fresh random one and
    * drops the audit columns, changing nothing else. Noise is never
    * negative-clipped (clipping would bias and break the DP guarantee);
    * a small group can legitimately release a negative count.
    *
    * One aggregation (map-side combined) + one map-side noise column —
    * group-count-sized output at any scale.
    *
    * Output: group cols + `n_noisy` + audit arms `n_true` and `noise`
    * (release gate drops them) + `noise_within_tail`.
    */
  def dpCounts(
      df: DataFrame,
      groupCols: Seq[(String, Column)],
      seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts: need at least one group column")
    val named = groupCols.map { case (n, c) => c.as(n) }
    // '|'-separated on purpose: bare concatenation would let adjacent
    // string keys collide ("ab","c" vs "a","bc") and draw the same noise.
    // Each key rides through coalesce with a NULL-sentinel (U+2400 — a
    // character no real key contains): concat_ws SKIPS nulls, so without
    // it two groups differing only in WHICH column is NULL would collide
    // to the same noise draw, defeating the '|' anti-collision rationale.
    val keyStr = concat_ws("|",
      lit(seed) +: groupCols.map { case (n, _) =>
        coalesce(col(n).cast("string"), lit("␀")) }: _*)
    val h = conv(substring(md5(keyStr), 1, 8), 16, 10).cast("long")
    // ascending CASE chain over the exact thresholds: first k with h < T(k)
    val noise = DpGeomThresholds.init.foldRight(
        lit(DpGeomThresholds.last._1): Column) {
      case ((k, t), acc) => when(h < t, lit(k)).otherwise(acc)
    }.cast("long")
    df.select(named: _*)
      .groupBy(groupCols.map(g => col(g._1)): _*)
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise", noise)
      .withColumn("n_noisy", col("n_true") + col("noise"))
      .withColumn("noise_within_tail", abs(col("noise")) <= 16)
  }

  def kAnonymize(df: DataFrame, quasiCols: Seq[(String, Column)], k: Int): DataFrame = {
    // The suppression join MUST be null-safe: groupBy in the audit groups
    // NULL quasi values into one class, but a plain equi-join never matches
    // NULL = NULL — a violating class whose quasi tuple contains a NULL
    // would be reported by the audit yet escape suppression, leaving its
    // remaining non-null quasi values exposed. `<=>` keys the join on the
    // exact same equivalence the audit grouped by.
    val viol = broadcast(
      quasiCols.foldLeft(kAnonymityAudit(df, quasiCols, k).drop("class_size")) {
        case (d, (n, _)) => d.withColumnRenamed(n, s"__v_$n")
      }.withColumn("__viol", lit(true)))
    val withQuasi = quasiCols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val cond = quasiCols.map { case (n, _) => col(n) <=> col(s"__v_$n") }.reduce(_ && _)
    val joined = withQuasi.join(viol, cond, "left_outer")
    val suppressed = quasiCols.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(n, when(col("__viol"), lit(null)).otherwise(col(n)))
    }
    suppressed.drop("__viol").drop(quasiCols.map(q => s"__v_${q._1}"): _*)
  }
}
