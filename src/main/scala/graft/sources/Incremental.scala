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

  /** EXACTLY-ONCE KEYED REPLICATION — [[consume]]'s shape fed by the
    * CHANGE DATA FEED instead of the append stream, so the mirror tracks
    * DELETES and UPDATES too (the Delta-CDF → downstream-replica loop;
    * [[consume]] refuses non-append commits, this is the general case).
    * One cycle: read [[SnapshotLog.readChanges]] over
    * `(lastConsumedVersion, current]`, reduce the feed to its NET effect
    * per key (the surviving image at each key's last active version —
    * within a version an insert wins over a delete, because an UPDATE is
    * a delete+insert pair), merge onto the last ANCHORED mirror state
    * with [[graft.operators.Cdc.applyChanges]], and anchor
    * `(source → consumed, mirror → produced)` in one atomic
    * [[TxnCatalog]] txn. Crash-safety and exactly-once are inherited
    * verbatim from [[consume]]: an unanchored mirror version is
    * invisible and the retried cycle re-derives the same net change set
    * against the same anchored base.
    *
    * The source must be KEYED (at most one live row per `keyCols` tuple);
    * a feed that nets TWO inserts for one key trips `applyChanges`'
    * raise_error guard — loud, never a silent duplicate.
    *
    * Scale: the feed read is change-sized (see [[SnapshotLog
    * .readChanges]]); the net-reduction shuffles change-count rows by
    * key; the merge rewrites the mirror (state-sized — the simple-correct
    * shape; a partition-pruned mirror composes [[graft.operators.Cdc
    * .applyChangesPruned]] with dynamic partition overwrite instead).
    *
    * @return `Some((txn, netChangeRows))`, `None` when the source has
    *         not advanced.
    */
  def mirror(
      spark: SparkSession,
      cat: TxnCatalog,
      source: String,
      out: String,
      keyCols: Seq[String],
      partitions: Int): Option[(Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lit, max, when}
    require(keyCols.nonEmpty, "mirror: need at least one key column")
    val srcLog = cat.tables.getOrElse(source,
      throw new IllegalArgumentException(s"mirror: unknown source table '$source'"))
    val outLog = cat.tables.getOrElse(out,
      throw new IllegalArgumentException(s"mirror: unknown mirror table '$out'"))
    val last = cat.current
    val consumed = last.map(t => cat.assignment(t)(source))
    val srcCur = srcLog.currentVersion.getOrElse(
      throw new IllegalStateException(s"mirror: source '$source' has no commits"))
    if (consumed.contains(srcCur)) return None
    val feed = srcLog.readChanges(spark, consumed.getOrElse(-1L), srcCur)

    // net effect per key: keep only each key's LAST active version; a key
    // whose last activity includes an insert upserts that image, a key
    // whose last activity is delete-only drops
    val wk = Window.partitionBy(keyCols.map(col): _*)
    val reduced = feed
      .withColumn("__maxv", max(col("_commit_version")).over(wk))
      .where(col("_commit_version") === col("__maxv"))
      .withColumn("__hasins",
        max(when(col("_change_type") === "insert", 1).otherwise(0)).over(wk))
      .where((col("_change_type") === "insert") === (col("__hasins") === 1))
      .withColumn("op", when(col("__hasins") === 1, lit("u")).otherwise(lit("d")))
      .drop("_change_type", "_commit_version", "__maxv", "__hasins")
    // collapse delete rows to one per key (their images are irrelevant);
    // upsert duplicates are NOT collapsed — two net inserts for one key
    // mean a non-keyed source, and must trip applyChanges' loud guard
    val net = reduced.where(col("op") === "u")
      .unionByName(reduced.where(col("op") === "d").dropDuplicates(keyCols))

    val base = last match {
      case Some(t) =>
        val v = cat.assignment(t)(out)
        val paths = outLog.dataFiles(v)
          .map(p => new java.io.File(outLog.dataRootPath, p).toString)
        if (paths.isEmpty) srcLog.read(spark, srcCur).limit(0)
        else spark.read.parquet(paths: _*)
      case None => srcLog.read(spark, srcCur).limit(0)
    }
    val merged = graft.operators.Cdc.applyChanges(base, net, keyCols)
    val n = net.count()
    // a cycle may net to zero rows (e.g. an insert+delete of the same
    // keys inside the window) — still anchor the consumed position
    val staged = outLog.stageData(merged, partitions)
    val outV = outLog.commit(outLog.currentVersion, staged)
    Some((cat.commitTxn(last, Map(source -> srcCur, out -> outV)), n))
  }
}
