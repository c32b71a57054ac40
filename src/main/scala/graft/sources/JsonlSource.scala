package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-declared JSON-Lines source/sink — the de-facto interchange format
  * for LLM text corpora (one JSON object per line; the big public corpora
  * all ship this way). Two disciplines, both 100 TB-motivated:
  *
  *   - Schema is EXPLICIT, never inferred. Inference is an extra sampling
  *     scan before the real read, and a sampled schema silently drops
  *     fields absent from the sample and widens types by luck — a corpus
  *     contract should be declared, not guessed.
  *   - Reads are FAILFAST. PERMISSIVE (Spark's default) turns a corrupt
  *     line into a row of nulls, which poisons a training corpus
  *     invisibly; a malformed crawl shard should fail the job loudly, not
  *     dilute the data. Callers that expect dirty shards can pass
  *     `permissiveWithCorruptColumn` instead and route the corrupt rows to
  *     quarantine — an explicit decision, never the silent default.
  *
  * Output is gzip-compressed by default: JSONL corpora ship compressed,
  * and gzip is per-file (not splittable), so a 100 TB layout wants many
  * ~100–500 MB part files — one read task each — rather than a few giant
  * ones. The writer inherits the input partitioning; size parts upstream
  * with `repartition`.
  *
  * No counterpart in the reference (its only raw format is CSV,
  * `RawConnector.scala:13-21`); extension tier.
  */
object JsonlSource {

  def write(df: DataFrame, path: String, compression: String = "gzip"): String = {
    df.write.mode("overwrite").option("compression", compression).json(path)
    path
  }

  def read(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Dirty-shard variant: corrupt lines surface as non-null
    * `_corrupt_record` with every schema field null — keep them out of the
    * corpus and into quarantine by filtering on that column. Spark caveat:
    * a query that references ONLY the corrupt column over a raw file scan
    * is rejected (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    * project at least one data column alongside it, or cache the parsed
    * frame first.
    */
  def permissiveWithCorruptColumn(
      spark: SparkSession,
      schema: StructType,
      path: String): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
