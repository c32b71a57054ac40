package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** EXACTLY-ONCE INCREMENTAL BATCH CONSUMPTION — the "process only what's
  * new since the last run" loop that moves most 100 TB pipelines (the
  * batch analog of [[graft.streaming.StreamingCdc.logStreamReplay]]'s
  * table-as-stream, and the shape Delta/Iceberg incremental reads +
  * checkpointed jobs formalize):
  *
  *  - The INCREMENT is discovered from log metadata alone: the data files
  *    appended in `(lastConsumedVersion, currentVersion]`
  *    ([[SnapshotLog.appendedFiles]] — file-count-sized planning, never a
  *    table rescan; rewrite commits in range refuse loudly rather than
  *    double-deliver rows).
  *  - EXACTLY-ONCE comes from anchoring the cursor WITH the output in one
  *    atomic [[TxnCatalog]] commit: `(source → consumed, out → produced)`.
  *    A crash after the output-log append but before the anchor leaves an
  *    output version no txn references — catalog readers never see it
  *    ([[TxnCatalog.readTable]]), [[TxnCatalog.unanchoredVersions]]
  *    reports it, and the retried run re-processes the same increment
  *    onto the last ANCHORED output listing (not the orphaned one), so
  *    the derived table observes each source row's effect exactly once.
  */
object Incremental {

  /** Run one consumer cycle: transform exactly the source rows appended
    * since the last anchored run and publish them onto the anchored
    * output. Returns `Some((txn, rowsProcessed))`, or `None` when the
    * source has not advanced (the no-op cycle commits nothing — an empty
    * anchor would only fog the history).
    *
    * `transform` must be PER-INCREMENT (row-local or increment-local:
    * projections, filters, enrichment joins against dimensions) — an
    * aggregate over all-time state belongs in a downstream MV
    * ([[graft.operators.Materialize]]), not here.
    */
  def consume(
      spark: SparkSession,
      cat: TxnCatalog,
      source: String,
      out: String,
      transform: DataFrame => DataFrame,
      partitions: Int): Option[(Long, Long)] = {
    val srcLog = cat.tables.getOrElse(source,
      throw new IllegalArgumentException(s"consume: unknown source table '$source'"))
    val outLog = cat.tables.getOrElse(out,
      throw new IllegalArgumentException(s"consume: unknown output table '$out'"))
    val last = cat.current
    val consumed = last.map(t => cat.assignment(t)(source))
    val srcCur = srcLog.currentVersion.getOrElse(
      throw new IllegalStateException(s"consume: source '$source' has no commits"))
    if (consumed.contains(srcCur)) return None
    val newVersions = srcLog.versions
      .filter(v => consumed.forall(v > _) && v <= srcCur)
    val files = newVersions.flatMap(srcLog.appendedFiles)
    require(files.nonEmpty,
      s"consume: source advanced to v$srcCur but appended no data files")
    val increment = spark.read.parquet(files: _*)
    val derived = transform(increment)
    val n = derived.count()
    // publish onto the last ANCHORED output listing — never onto the
    // output log's raw current, which may hold a crashed run's orphan
    val baseFiles = last.map(t => outLog.files(cat.assignment(t)(out))).getOrElse(Nil)
    val staged = outLog.stageData(derived, partitions)
    val outV = outLog.commit(outLog.currentVersion, baseFiles ++ staged)
    Some((cat.commitTxn(last, Map(source -> srcCur, out -> outV)), n))
  }
}
