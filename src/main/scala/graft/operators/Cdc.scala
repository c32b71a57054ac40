package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level change-data-capture merge — the MERGE INTO semantics a
  * warehouse applies when a CDC feed (upserts + deletes) lands on a base
  * relation, expressed without any table-format dependency: ONE full-outer
  * shuffle join on the key decides every row's fate. This is the row-level
  * complement of [[graft.sources.TableManager]]'s partition-level
  * idempotent overwrite: partitions for append-shaped loads, keyed merge
  * for mutating feeds.
  *
  * Semantics (strict full-row-image CDC):
  *  - change `op = 'd'`: the key is dropped (a delete for an absent key is
  *    a no-op);
  *  - change `op = 'u'` or `'i'`: the change row's full image replaces /
  *    inserts the key (an update for an absent key inserts — upsert);
  *  - no change row: the base row passes through untouched.
  * Changes carry FULL row images, so an update CAN set a column to NULL —
  * the merge selects sides by change presence, never by value coalescing.
  * At most one change row per key (CDC compaction is the feed's contract).
  * The contract is ENFORCED by default (`validate = true`): a second
  * change row for any key fails the job with `raise_error` instead of
  * silently emitting join-order-dependent duplicate/contradictory rows.
  * The guard is a windowed count partitioned by the SAME key the merge
  * joins on, so its shuffle is the one the join needs anyway — cost is
  * one extra window aggregation, no extra exchange. Pass
  * `validate = false` only when the feed is compacted upstream by
  * construction and the window pass is worth skipping.
  *
  * Scale shape: one shuffle each side hash-partitioned by the key (or zero
  * exchanges if both sides are bucketed on it — [[graft.sources.Bucketing]]),
  * no broadcast assumption (CDC batches can be arbitrarily large), and the
  * output is immediately writable back through the partitioned sink.
  */
object Cdc {

  /** Executed-plan probe for the most recent [[applyChangesPruned]] call —
    * lets PlanSpec pin that the base scan carries PartitionFilters (the
    * prune actually reached the source) without widening the signature.
    */
  @volatile private[graft] var lastPrunedMergePlan: String = ""

  /** PARTITION-PRUNED CDC merge: at 100 TB a CDC batch typically touches a
    * fraction of the base's partitions, and the full-outer shape of
    * [[applyChanges]] would still read (and a rewrite would rewrite) ALL of
    * them. This variant computes the set of partitions the change batch
    * touches, restricts the merge to THOSE partitions of the base — the
    * partition predicate is a literal disjunction, so it reaches the scan
    * as PartitionFilters (static pruning, PlanSpec-pinned) — and returns
    * only the touched partitions' merged rows, ready for
    * [[graft.sources.TableManager]]-style DYNAMIC partition overwrite:
    * untouched partitions are never read and never rewritten.
    *
    * The touched-partition collect is METADATA-scale (bounded by the
    * number of partitions one CDC batch touches, never by data volume) —
    * the same class as a partition listing, not a data-plane collect.
    *
    * Contract (on top of [[applyChanges]]'s): partition values are STABLE
    * per key — full-row-image changes carry their key's partition value,
    * and a feed that MOVES a key across partitions must use the
    * unpartitioned [[applyChanges]] (the old partition's row lives outside
    * the pruned read, so a move would duplicate the key; this is the
    * standard immutable-partition-key constraint of pruned MERGEs). Insert
    * rows may target partitions absent from the base — dynamic overwrite
    * creates them.
    */
  def applyChangesPruned(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      partCols: Seq[String],
      opCol: String = "op",
      validate: Boolean = true): DataFrame = {
    require(partCols.nonEmpty, "applyChangesPruned: need at least one partition column")
    require(keyCols.intersect(partCols).isEmpty,
      s"applyChangesPruned: key and partition columns overlap: ${keyCols.intersect(partCols)}")
    val touched = changes.select(partCols.map(col): _*).distinct().collect()
    require(touched.nonEmpty, "applyChangesPruned: empty change batch (no partitions touched)")
    val pred = touched.map { row =>
      partCols.zipWithIndex.map { case (c, i) => col(c) <=> lit(row.get(i)) }.reduce(_ && _)
    }.reduce(_ || _)
    val merged = applyChanges(base.where(pred), changes, keyCols, opCol, validate)
    lastPrunedMergePlan = merged.queryExecution.executedPlan.toString
    merged
  }

  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op",
      validate: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges: need at least one key column")
    val ops = Set("i", "u", "d")
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    val b = base.select(
      keyCols.map(col) ++ dataCols.map(n => col(n).as(s"__b_$n")): _*)
    val c0 = changes.select(
      keyCols.map(col) ++ dataCols.map(n => col(n).as(s"__c_$n"))
        :+ col(opCol).as("__c_op"): _*)
    val c =
      if (!validate) c0
      else {
        // at-most-one-change-per-key contract: fail the job loudly on a
        // non-compacted feed instead of corrupting the merged state
        // the guard rides the __c_op column (used downstream) — a guard on
        // a column that is immediately dropped would be pruned by Catalyst
        // and never evaluate
        val wk = Window.partitionBy(keyCols.map(col): _*)
        c0.withColumn("__c_n", count(lit(1)).over(wk))
          .withColumn(
            "__c_op",
            when(col("__c_n") === 1L, col("__c_op")).otherwise(
              raise_error(concat(
                lit("applyChanges: multiple change rows for key ("),
                concat_ws(",", keyCols.map(n => col(n).cast("string")): _*),
                lit(") — compact the CDC feed or pass validate = false")))))
          .drop("__c_n")
      }
    b.join(c, keyCols, "full_outer")
      // fail loudly on an unknown op rather than silently passing it through
      .withColumn(
        "__c_op",
        when(col("__c_op").isNull || col("__c_op").isin(ops.toSeq: _*), col("__c_op"))
          .otherwise(raise_error(concat(lit("applyChanges: unknown op "), col("__c_op")))))
      .where(col("__c_op").isNull || col("__c_op") =!= "d")
      .select(
        keyCols.map(col) ++ dataCols.map { n =>
          when(col("__c_op").isNotNull, col(s"__c_$n"))
            .otherwise(col(s"__b_$n")).as(n)
        }: _*)
  }
}
