package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational integrity audits — the pre-flight checks a pipeline runs
  * before trusting its joins: a fact row whose foreign key resolves to
  * nothing silently VANISHES from an inner join (or null-pads a left one),
  * and a duplicated primary key silently FANS OUT every downstream join —
  * both corrupt training data without ever failing a job. Auditing first
  * turns silent corruption into a number.
  *
  * Every check emits the same row shape `(check_name, n_checked, n_violations)`
  * so reports union cleanly and the whole audit is one plan. Scale: an FK
  * check is one LEFT ANTI join on the key (broadcast when the parent's key
  * column is dim-sized; null keys counted map-side, never shuffled); a PK
  * check is one count-per-key aggregate that combines map-side. Nothing
  * here is data-shaped beyond the joins the pipeline was about to run
  * anyway — which is exactly why running the audit first is cheap
  * insurance.
  */
object Audit {

  /** One FK check: rows of `child` whose non-null `childKey` has no match
    * in `parent.parentKey`, plus null-key rows counted separately as
    * violations (a null FK can't resolve either — callers that allow
    * optional references should filter first).
    *
    * `broadcastParent` (default true) suits DIM-sized parents — the anti
    * join ships the distinct key set to every task and nothing shuffles.
    * For a FACT-sized parent (e.g. auditing lineitem→orders, where the
    * parent key set is the orders table itself) pass false: forcing a
    * broadcast there would build the whole key set on the driver; the
    * shuffled left-anti join is the scale-correct shape (and exchange-free
    * when both sides are bucketed on the key).
    */
  def fkOrphans(
      check: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      broadcastParent: Boolean = true): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val keysSide = if (broadcastParent) broadcast(keys) else keys
    val nonNull = child.where(col(childKey).isNotNull)
    val orphans = nonNull
      .join(keysSide, col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val totals = child.agg(
      count(lit(1)).as("n_checked"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L)).as("n_null"))
    totals.crossJoin(broadcast(orphans))
      .select(
        lit(check).as("check_name"),
        col("n_checked"),
        (col("n_orphans") + col("n_null")).as("n_violations"))
  }

  /** One PK check: `n_violations = rows - distinct non-null keys` — the
    * extra copies of a duplicated key count individually, and EVERY
    * null-keyed row is a violation (a primary key must be non-null AND
    * unique). A clean table scores 0. One aggregate, map-side combined.
    */
  def dupPrimaryKeys(check: String, df: DataFrame, key: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col(key))).as("n_violations"))
      .select(lit(check).as("check_name"), col("n_checked"), col("n_violations"))

  /** Union a set of checks into one ordered report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "Audit.report: no checks given")
    checks.reduce(_.unionByName(_)).orderBy(col("check_name"))
  }

  /** NULL-safe canonical field serialization for [[tableFingerprint]]:
    * callers cast each field to a PORTABLE string form first (decimal-2
    * money, `date_format` dates — raw double/timestamp formatting differs
    * across engines); this only supplies the null sentinel. `concat_ws`
    * SKIPS nulls, which would make `(a, NULL, b)` collide with `(a, b,
    * NULL)` — the sentinel keeps every field positional.
    */
  def canonicalField(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(c.cast("string"), lit("\\N"))

  /** Order-invariant table digest: two independent md5-derived 32-bit row
    * hashes SUMMED over the table, plus the row count — the
    * replication/equality audit that answers "do these two copies hold the
    * same multiset of rows?" without moving either side. Sums commute, so
    * the digest is independent of row order, partitioning, file layout,
    * and engine; comparing two moments means forging a mismatch requires a
    * simultaneous collision in BOTH hash families. One map-side pass, one
    * 1-row aggregate — the cheapest possible full-table certificate at
    * 100 TB (ship 4 numbers, not the table).
    */
  def tableFingerprint(df: DataFrame, name: String, serialized: org.apache.spark.sql.Column): DataFrame = {
    val h1 = conv(substring(md5(serialized), 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(md5(concat(serialized, lit("#2"))), 1, 8), 16, 10).cast("long")
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(h1).as("digest1"),
      sum(h2).as("digest2"))
      .select(lit(name).as("table_name"), col("n_rows"), col("digest1"), col("digest2"))
  }
}
