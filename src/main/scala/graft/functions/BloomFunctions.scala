package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column access to Spark's own Bloom-filter machinery — the
  * [[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]]
  * / [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * pair Catalyst itself injects for runtime row-level filtering — so set
  * membership can ride a compact bitmap instead of a broadcast hash set.
  * The aggregate ORs fixed-seed xxhash64 bit positions, so the bitmap is
  * deterministic regardless of row or merge order; `mightContain` can
  * return a false POSITIVE but never a false negative, the asymmetry every
  * caller here leans on.
  */
object BloomFunctions {

  /** Registered lazily, same contract as [[VectorFunctions.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Bits for the standard optimal-m formula `-n·ln(p) / ln(2)²` — what
    * `spark.util.sketch.BloomFilter` allocates for (n, fpp).
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate `v` (any xxhash64-able column) into a serialized Bloom filter
    * (binary). One pass, mergeable map-side partials (bitmap OR).
    */
  def bloomAgg(v: Column, expectedItems: Long, fpp: Double): Column =
    call_function(
      "graft_bloom_agg",
      xxhash64(v),
      lit(expectedItems),
      lit(optimalNumBits(expectedItems, fpp)))

  /** Membership probe of `v` against a serialized filter (usually a binary
    * literal riding the plan — Catalyst's own runtime-filter shape).
    */
  def bloomContains(filter: Column, v: Column): Column =
    call_function("graft_bloom_contains", filter, xxhash64(v))
}
