package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Accessors for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf&lt;N&gt;/`. At 100 TB these
  * would be partitioned/bucketed datasets; the scan-side code is identical —
  * `spark.read.parquet(path)` with Catalyst pushing filters and pruning
  * columns into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` arrives in whatever flavor the generator's writer chose,
    * and both non-LTZ flavors are normalized to a session-tz (UTC)
    * `TimestampType` here so every consumer — including the streaming
    * watermark path, which REQUIRES an LTZ event-time column — sees one
    * type:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 has no nanos type; read as a long
    *    (`spark.sql.legacy.parquet.nanosAsLong`, set by [[nanosConf]]) and
    *    rebuilt as microseconds with exact integer math;
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *    `TIMESTAMP_NTZ`; cast to LTZ, which under the project-wide UTC
    *    session timezone is the exact identity on the underlying micros —
    *    the same instants the nanos path produced, and the same naive
    *    values the DuckDB oracle reads.
    *
    * The reference's whole-second gap semantics only ever look at
    * `unix_timestamp` anyway (SURVEY.md §2.8 F4).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")

  /** Register every table as a temp view so templated-SQL entry points
    * (SqlEntry, mirroring the reference's `{TABLE}` substitution —
    * /root/reference/src/main/scala/connector/hive/HiveConnector.scala:29-32)
    * can resolve them by name.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** Conf required before reading `events.parquet` (nanosecond timestamps). */
  val nanosConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"
}
