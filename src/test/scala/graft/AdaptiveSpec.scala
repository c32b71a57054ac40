package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning pins — the engine-side answer to skew that
  * [[graft.operators.SkewJoin]]'s explicit salting complements: with
  * adaptive execution on, a sort-merge join whose shuffle produces one
  * oversized partition is SPLIT at runtime (`skew=true` in the final
  * plan), no query rewrite required. The spec pins that the repo's
  * recommended conf actually triggers the optimization on a hot key, and
  * that the split join returns exactly the unsplit result.
  */
class AdaptiveSpec extends AnyFunSuite {
  import SparkTestSession._

  test("AQE splits the hot partition of a skewed SMJ at runtime (skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 holds 3/4 of the fact; the rest spreads over 49 keys
      val fact = spark.range(200000).select(
        when(col("id") < 150000L, 0L).otherwise(pmod(col("id"), lit(49)) + 1).as("k"),
        col("id").as("payload"))
      val dim = spark.range(50).select(col("id").as("k"), (col("id") * 10).as("dv"))
      val joined = fact.join(dim, Seq("k"))
      // execute THIS frame's own plan (a derived .agg would adapt a
      // different query and leave joined's AQE plan un-finalized)
      val rows = joined.collect()
      // every fact row matches exactly one dim row — the split must not
      // duplicate or drop
      assert(rows.length == 200000)
      assert(rows.count(_.getLong(0) == 0L) == 150000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan never finalized:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (conf too loose for this data?):\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("without AQE skew handling the same join plans unsplit (control)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000).select(
        when(col("id") < 150000L, 0L).otherwise(pmod(col("id"), lit(49)) + 1).as("k"))
      val dim = spark.range(50).select(col("id").as("k"))
      val joined = fact.join(dim, Seq("k"))
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(!plan.contains("skew=true"))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
