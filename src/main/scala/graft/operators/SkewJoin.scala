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
}
