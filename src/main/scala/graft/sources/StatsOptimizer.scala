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

  /** Stats-driven JOIN ORDER over a 3-table star (fact ⋈ dimA ⋈ dimB on
    * distinct keys) — the textbook System-R move the pairwise
    * [[statsJoin]] cannot express: with the independence estimate
    * `|fact ⋈ dim| = |fact|·|dim| / max(ndv_fact(k), ndv_dim(k))` from
    * the PERSISTED analyze numbers, the more SELECTIVE dimension joins
    * FIRST, so the second join scans the smallest possible intermediate.
    * Both dims broadcast (they won the statsJoin size test by
    * construction of a star schema); the fact side never shuffles.
    * Stats freshness is enforced per table exactly as in [[statsJoin]].
    *
    * Returns the joined frame plus the decision record: the two
    * estimates, which dim was chosen first, and the inputs — so the
    * declared query can measure that the estimate RANKED the real
    * intermediate sizes correctly rather than trusting the formula.
    */
  def statsJoin3(
      spark: SparkSession,
      fact: SnapshotLog,
      dimA: SnapshotLog,
      dimB: SnapshotLog,
      keyA: String,
      keyB: String): (DataFrame, StatsJoin3Decision) = {
    def statsOf(log: SnapshotLog, side: String, key: String): (Long, Long) = {
      val v = log.currentVersion.getOrElse(throw new IllegalStateException(
        s"statsJoin3: $side log at ${log.root} has no committed snapshot"))
      val (rows, ndv) = log.tableStats(v).getOrElse(throw new IllegalStateException(
        s"statsJoin3: $side log at ${log.root} has no tablestats — run analyze() first"))
      if (!log.statsState(v).contains(log.dataStateDigest(v)))
        throw new IllegalStateException(
          s"statsJoin3: $side log at ${log.root} has STALE tablestats — re-run analyze()")
      require(ndv.contains(key),
        s"statsJoin3: $side tablestats carry no NDV for $key (have ${ndv.keys.mkString(", ")})")
      (rows, ndv(key))
    }
    val (fRows, _) = statsOf(fact, "fact", keyA)
    val (_, fNdvB) = statsOf(fact, "fact", keyB)
    val (_, fNdvA) = statsOf(fact, "fact", keyA)
    val (aRows, aNdv) = statsOf(dimA, "dimA", keyA)
    val (bRows, bNdv) = statsOf(dimB, "dimB", keyB)
    val estA = fRows * aRows / math.max(fNdvA, aNdv).max(1L)
    val estB = fRows * bRows / math.max(fNdvB, bNdv).max(1L)
    val aFirst = estA <= estB
    val f = fact.readLatest(spark)
    val a = broadcast(dimA.readLatest(spark))
    val b = broadcast(dimB.readLatest(spark))
    val joined =
      if (aFirst) f.join(a, Seq(keyA)).join(b, Seq(keyB))
      else f.join(b, Seq(keyB)).join(a, Seq(keyA))
    (joined, StatsJoin3Decision(fRows, estA, estB, aFirst))
  }
}

/** The decision record of one stats-driven 3-table join order.
  *
  * @param factRows fact row count from its tablestats
  * @param estIntermediateA estimated |fact ⋈ dimA| from the stats
  * @param estIntermediateB estimated |fact ⋈ dimB| from the stats
  * @param dimAFirst true when dimA was chosen as the FIRST join (its
  *                  estimated intermediate was no larger)
  */
case class StatsJoin3Decision(
    factRows: Long,
    estIntermediateA: Long,
    estIntermediateB: Long,
    dimAFirst: Boolean)
