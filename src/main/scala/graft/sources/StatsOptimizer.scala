package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** The decision record of one stats-driven join plan: what the persisted
  * ANALYZE numbers said and what was chosen because of them.
  *
  * @param leftRows      rowCount from the left log's tablestats
  * @param rightRows     rowCount from the right log's tablestats
  * @param broadcastLeft true when the LEFT side was chosen as the
  *                      broadcast build side (it was the smaller by stats)
  * @param buildKeyNdv   the build side's recorded key NDV
  * @param buildKeyUnique whether the build side's key is unique per its
  *                       stats (NDV == rows) — the safety check that the
  *                       broadcast inner join cannot fan rows out
  */
case class StatsJoinDecision(
    leftRows: Long,
    rightRows: Long,
    broadcastLeft: Boolean,
    buildKeyNdv: Long,
    buildKeyUnique: Boolean)

/** Closing the stats loop: [[SnapshotLog.analyze]] persists row counts and
  * exact NDVs in the log's metadata; this consumer turns them into an
  * actual OPTIMIZER DECISION — which side of a join to broadcast — instead
  * of leaving the numbers as passive documentation. Spark's own broadcast
  * threshold reads compressed SCAN sizes, which mis-rank tables whose
  * on-disk bytes and row counts diverge (wide strings vs packed ints, or
  * post-delete merge-on-read tables whose masked size is far below their
  * file size); the log's stats describe the LOGICAL table, exactly.
  */
object StatsOptimizer {

  /** Inner equi-join of two snapshot-log tables on `key`, the broadcast
    * build side chosen by the PERSISTED row counts (smaller side builds).
    * Both logs must have been [[SnapshotLog.analyze]]d with `key` among
    * their columns — missing stats are refused loudly rather than guessed
    * around (run ANALYZE; that is the contract of every CBO). Returns the
    * joined frame and the decision record so callers (and the plan-pinned
    * query) can assert the choice came from the stats.
    */
  def statsJoin(
      spark: SparkSession,
      left: SnapshotLog,
      right: SnapshotLog,
      key: String): (DataFrame, StatsJoinDecision) = {
    def statsOf(log: SnapshotLog, side: String): (Long, Map[String, Long]) = {
      val v = log.currentVersion.getOrElse(throw new IllegalStateException(
        s"statsJoin: $side log at ${log.root} has no committed snapshot"))
      val stats = log.tableStats(v).getOrElse(throw new IllegalStateException(
        s"statsJoin: $side log at ${log.root} has no tablestats — run analyze() first"))
      // append/merge CARRY the tablestats meta line forward, so the
      // numbers can describe an arbitrarily stale table — refuse unless
      // the data state (file + mask sets) still matches the one the
      // analyze recorded; a cost decision from stale counts is a silently
      // wrong plan, the exact failure a CBO contract exists to prevent
      val recorded = log.statsState(v)
      if (!recorded.contains(log.dataStateDigest(v)))
        throw new IllegalStateException(
          s"statsJoin: $side log at ${log.root} has STALE tablestats — " +
            s"data-changing commits happened after the last analyze " +
            s"(recorded state ${recorded.getOrElse("<none>")}); re-run analyze()")
      stats
    }
    val (lRows, lNdv) = statsOf(left, "left")
    val (rRows, rNdv) = statsOf(right, "right")
    Seq(("left", lNdv), ("right", rNdv)).foreach { case (side, m) =>
      require(m.contains(key),
        s"statsJoin: $side tablestats carry no NDV for join key $key " +
          s"(have ${m.keys.mkString(", ")}); re-run analyze including it")
    }
    val broadcastLeft = lRows <= rRows
    val lDf = left.readLatest(spark)
    val rDf = right.readLatest(spark)
    val joined =
      if (broadcastLeft) rDf.join(broadcast(lDf), Seq(key))
      else lDf.join(broadcast(rDf), Seq(key))
    val (bRows, bNdv) = if (broadcastLeft) (lRows, lNdv(key)) else (rRows, rNdv(key))
    (joined, StatsJoinDecision(lRows, rRows, broadcastLeft, bNdv, bNdv == bRows))
  }
}
