package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skew that AQE can't always fix.
  *
  * A shuffled equi-join routes every row of a hot key to ONE reducer; at
  * 100 TB a single power-key (the bot user, the empty-string document, the
  * null-ish default) becomes a straggler task holding the whole stage. AQE's
  * skew-join split handles the sort-merge case after the fact; explicit
  * salting handles it by construction, works for any join the optimizer
  * plans, and keeps working when the skewed side is the OUTPUT of an
  * upstream stage AQE can't re-split.
  *
  * Mechanics: the big side gets a deterministic salt in [0, salts) hashed
  * from a high-cardinality column; the small side is replicated once per
  * salt value; the join key becomes (key, salt). Row-for-row equal to the
  * plain join (each big row meets exactly the one replica carrying its
  * salt), with the hot key's rows spread over `salts` reducers. Cost: the
  * small side shuffles `salts`× its size — cheap when it is dimension-sized
  * (and if it is broadcast-sized, broadcast instead; salting is for when
  * BOTH sides are too big to broadcast and one is skewed).
  */
object SkewJoin {

  /** `big ⋈ small` on `key` with `salts`-way salting. `bigSaltOn` must be a
    * deterministic expression over the big side, ideally high-cardinality
    * (a row id) so the hot key's rows spread evenly. Supports "inner" and
    * "left" (null-extended big rows appear exactly once).
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      bigSaltOn: Column,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    // the helper column must not shadow (and then silently drop) user data
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
    val salted = big.withColumn("__salt", pmod(hash(bigSaltOn), lit(salts)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pre-flight shuffle-load diagnostic: how the rows of `df` would land on
    * `nBuckets` reducers when partitioned by `key` alone (`raw`) vs by
    * `(key, salt)` (`salted`, salt = `saltOn % salts`) — the measurement
    * that tells an operator whether a planned join/agg needs
    * [[saltedEquiJoin]] BEFORE burning a cluster-day discovering the
    * straggler. One row per layout: non-empty bucket count, total rows, the
    * hottest bucket's load, and `imbalance_ppm` = `max_load · nBuckets ·
    * 10^6 div total` (a perfectly even layout scores 10^6; a single-bucket
    * pile-up scores `nBuckets · 10^6`).
    *
    * The bucket function is the engine-portable md5 arithmetic (the
    * [[Sampling.hashUniform]] / shard-id discipline), NOT Spark's
    * internal murmur3 — the point is a deterministic, oracle-replayable
    * MODEL of hash partitioning, not a byte-exact prediction of Spark's
    * exchange (same family, same load statistics). Cost: one
    * bucket-cardinality aggregate per layout over one map-side pass —
    * diagnostic-sized, not data-sized.
    */
  def shuffleSkewReport(
      df: DataFrame,
      key: Column,
      saltOn: Column,
      nBuckets: Int = 32,
      salts: Int = 8): DataFrame = {
    require(nBuckets > 0 && salts > 0, "nBuckets and salts must be positive")
    def bucketOf(k: Column): Column =
      conv(substring(md5(k.cast("string")), 1, 8), 16, 10).cast("long") % nBuckets
    def layout(name: String, k: Column): DataFrame =
      df.select(bucketOf(k).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
        .agg(
          count(lit(1)).as("n_buckets_used"),
          sum(col("n_rows")).as("total_rows"),
          max(col("n_rows")).as("max_load"))
        .select(
          lit(name).as("layout"), col("n_buckets_used"), col("total_rows"),
          col("max_load"),
          expr(s"max_load * $nBuckets * 1000000 div total_rows").as("imbalance_ppm"))
    layout("raw", key)
      .unionByName(layout(
        "salted", concat(key.cast("string"), lit("#"), (saltOn % salts).cast("string"))))
      .orderBy(col("layout"))
  }
}
