package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analogs of the batch session pipeline (SURVEY §2.9 /
  * §7 stretch: the reference is batch-only; its manual cross-batch
  * continuity — `DataLoadTransformer.scala:94-159` — is exactly what
  * `flatMapGroupsWithState` session state gives the streaming engine).
  *
  * [[sessionize]] reproduces the batch [[graft.operators.Sessionize]]
  * semantics bit-for-bit on an in-order stream: whole-second gap `>= gap`
  * starts a new session, ids are the same deterministic
  * `user_id#<session-start-sec>`, ties broken on `event_id`. The per-user
  * state is ONE open session (start + last-seen second) — the streaming
  * equivalent of the batch ETL's boundary "tail" slice — evicted via
  * event-time timeout once the watermark guarantees no continuation can
  * arrive. StreamingSpec proves streaming == batch on a split stream (the
  * same invariance SessionizeSpec proves for batch continuity).
  *
  * Scale notes: state is O(active users) × a 2-long record, hash-partitioned
  * by user across executors (same key as the batch window exchange); the
  * watermark bounds state lifetime, so a 1000-executor cluster holds sessions
  * for the active-user working set only, not history.
  */
object StreamingSessionize {

  /** One open session per user: where it started, and the last second seen. */
  case class OpenSession(session_start_sec: Long, last_epoch_sec: Long)

  /** Output row — mirrors the batch sessionize columns. */
  case class SessionizedEvent(
      event_id: Long,
      user_id: Long,
      epoch_sec: Long,
      is_new_session: Boolean,
      session_start_sec: Long,
      session_id: String)

  private type InRow = (Long, Long, java.sql.Timestamp, Long)

  /** Sessionize a streaming frame with columns (event_id, user_id, ts).
    * `watermarkDelay` must exceed the expected out-of-orderness; state for a
    * user is dropped once the watermark passes `last event + gapSeconds`
    * (after that, any in-order event starts a new session anyway, so
    * eviction cannot change results).
    */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = 300L,
      watermarkDelay: String = "10 minutes"): Dataset[SessionizedEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(
        col("event_id").cast("long"), col("user_id").cast("long"),
        col("ts"), unix_timestamp(col("ts")).as("epoch_sec"))
      .as[InRow]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(process(gapSeconds) _)
  }

  private def process(gap: Long)(
      user: Long,
      rows: Iterator[InRow],
      state: GroupState[OpenSession]): Iterator[SessionizedEvent] = {
    if (!rows.hasNext) {
      // timeout firing with no data: the open session can no longer continue
      if (state.hasTimedOut) state.remove()
      return Iterator.empty
    }
    // within-trigger ordering: (epoch_sec, event_id), same as the batch window
    val sorted = rows.toSeq.sortBy(e => (e._4, e._1))
    var open = state.getOption
    val out = sorted.map { case (eventId, userId, _, sec) =>
      val isNew = open.forall(s => sec - s.last_epoch_sec >= gap)
      val start = if (isNew) sec else open.get.session_start_sec
      open = Some(OpenSession(start, sec))
      SessionizedEvent(eventId, userId, sec, isNew, start, s"$userId#$start")
    }
    open.foreach { s =>
      state.update(s)
      // evict once no event could continue this session; the timeout must be
      // beyond the CURRENT watermark (another user may have advanced it past
      // this user's horizon, which just means immediate-eligible eviction)
      state.setTimeoutTimestamp(
        math.max((s.last_epoch_sec + gap) * 1000L, state.getCurrentWatermarkMs() + 1L))
    }
    out.iterator
  }

  /** Streaming exact dedup over a document stream: first occurrence of each
    * content fingerprint ([[graft.operators.TextAnalysis.fingerprint]] — the
    * same md5-of-normalized-text key the batch [[graft.operators.Dedup]]
    * groups on) passes, later duplicates drop.
    * `dropDuplicatesWithinWatermark` bounds the fingerprint state by the
    * watermark — the batch operator's "one shuffle on the fingerprint"
    * becomes "state keyed on the fingerprint, evicted after
    * `watermarkDelay`", which is the only formulation that survives an
    * unbounded stream (plain dropDuplicates grows state forever).
    */
  def exactDedup(
      docs: DataFrame,
      watermarkDelay: String = "1 hour",
      textCol: String = "text",
      tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Near-dup detection AT INGESTION: each streaming document's MinHash
    * signature (the same codegen'd [[graft.functions.TextKernels]] kernels —
    * deterministic expressions, so they run unchanged under streaming) is
    * banded and joined against the STATIC corpus's band index; matches are
    * exact-verified on signature agreement before emitting. Stream-static
    * inner joins are stateless, so the only state is the duplicate
    * suppressor (watermark-bounded). Output: one row per (incoming doc,
    * matched corpus doc) with the signature-match estimate.
    *
    * This is the production shape for "reject duplicates before they land":
    * the corpus index is a broadcast-or-bucketed static side refreshed per
    * deployment, and the per-event cost is one kernel pass + one equi-join
    * probe.
    */
  def nearDupIngest(
      stream: DataFrame,
      corpus: DataFrame,
      minEstJaccard: Double = 0.5,
      bands: Int = 8,
      watermarkDelay: String = "10 minutes",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.{round => sqlRound}
    import graft.functions.TextKernels
    import graft.operators.TextAnalysis
    TextKernels.register(stream.sparkSession)
    val k = graft.operators.Dedup.MinhashSeeds.size
    val corpusBanded = bandedSigs(graft.operators.Dedup.minhashSignatures(corpus))
      .withColumnRenamed("doc_id", "corpus_doc_id")
      .withColumnRenamed("sig", "corpus_sig")
    // signatures built inline (not via Dedup.minhashSignatures) so the
    // event-time column survives for the watermark + duplicate suppressor
    val streamSigs = stream.withWatermark("ts", watermarkDelay)
      .select(
        col("doc_id"), col("ts"),
        TextKernels.shingleGrams(TextAnalysis.tokens(col(textCol)), 3).as("grams"))
      .where(size(col("grams")) > 0)
      .select(col("doc_id"), col("ts"), TextKernels.minhashSig(col("grams")).as("sig"))
    val streamBanded = bandedSigs(streamSigs)
    streamBanded.join(corpusBanded, Seq("band", "band_key"))
      .withColumn(
        "n_match",
        size(filter(zip_with(col("sig"), col("corpus_sig"), (x, y) => x === y), b => b)))
      .withColumn("est_jaccard", sqlRound(col("n_match").cast("double") / k, 6))
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("doc_id"), col("corpus_doc_id"), col("est_jaccard"), col("ts"))
      .dropDuplicatesWithinWatermark("doc_id", "corpus_doc_id")
  }

  private def bandedSigs(sigs: DataFrame, bands: Int = 8): DataFrame = {
    val k = graft.operators.Dedup.MinhashSeeds.size
    val rows = k / bands
    sigs.select(
      col("*"),
      posexplode(
        array((0 until bands).map(b =>
          concat_ws(",", (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)): _*))
        .as(Seq("band", "band_key")))
  }

  /** Streaming weekly-active-users: Monday-aligned 7-day tumbling windows
    * (epoch day 0 is a Thursday — the 4-day startTime shift aligns window
    * starts to Mondays, matching the batch `date_trunc('week', ts)`), HLL++
    * distinct per window ([[graft.operators.Wau.wauApprox]] is the batch
    * twin — exact streaming COUNT(DISTINCT) would need update-mode with
    * per-key state; the sketch keeps append-mode + bounded state, the right
    * trade at 100 TB/day rates).
    */
  def wauApprox(
      events: DataFrame,
      keyCol: String = "user_id",
      watermarkDelay: String = "1 day",
      rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days"))
      .agg(approx_count_distinct(col(keyCol), rsd).as("wau_approx"))
      .select(to_date(col("window.start")).as("event_week"), col("wau_approx"))
}
