package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("co-bucketed tables sort-merge-join with zero exchanges") {
    Bucketing.writeBucketed(
      Tables.orders(spark, SfDir), "b_orders_spec", "o_custkey", 4, sortKey = Some("o_custkey"))
    Bucketing.writeBucketed(
      Tables.customer(spark, SfDir), "b_customer_spec", "c_custkey", 4, sortKey = Some("c_custkey"))

    // force the shuffled-join path so the assertion is about bucketing, not
    // about broadcast thresholds or adaptive replanning
    val prev = (
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      spark.conf.get("spark.sql.adaptive.enabled"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_orders_spec")
        .join(spark.table("b_customer_spec"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")

      // and it is still the CORRECT join
      val viaBuckets = joined.count()
      val direct = Tables.orders(spark, SfDir).join(
        Tables.customer(spark, SfDir),
        col("o_custkey") === col("c_custkey")).count()
      assert(viaBuckets == direct && direct > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._1)
      spark.conf.set("spark.sql.adaptive.enabled", prev._2)
      spark.sql("DROP TABLE IF EXISTS b_orders_spec")
      spark.sql("DROP TABLE IF EXISTS b_customer_spec")
    }
  }
}
