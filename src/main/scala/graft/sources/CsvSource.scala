package graft.sources

import java.time.YearMonth
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-declared CSV source — the reference's raw connector surface
  * (`/root/reference/src/main/scala/connector/raw/RawConnector.scala:13-21`,
  * month-name path resolution `RawUserEventConnector.scala:23-33`).
  *
  * Schema is explicit (never inferred — inference is a full extra pass over
  * 100 TB of text) and `header=true`. Timestamps are written/parsed with an
  * explicit microsecond pattern so a parquet→csv→parquet round-trip is
  * lossless (the reference parses its own literal-suffix pattern the same
  * way, SURVEY.md §2.8 F1).
  */
class CsvSource(schema: StructType, timestampFormat: String = CsvSource.TsFormat) {

  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .csv(paths: _*)

  /** `yyyy-MM` strings → `<root>/yyyy-LLL.csv` paths (English month abbrev),
    * then a single multi-file scan.
    */
  def readMonths(spark: SparkSession, root: String, yearMonths: Seq[String]): DataFrame =
    read(spark, yearMonths.map(m => s"$root/${CsvSource.monthFileName(m)}"))
}

object CsvSource {
  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val fileFmt = DateTimeFormatter.ofPattern("yyyy-LLL", Locale.ENGLISH)

  def monthFileName(yearMonth: String): String =
    s"${YearMonth.parse(yearMonth).format(fileFmt)}.csv"

  /** Symmetric writer (used by tests/round-trip queries): one directory of
    * csv part files per month, named `yyyy-LLL.csv` like the reference's
    * input layout.
    */
  def writeMonth(df: DataFrame, root: String, yearMonth: String): String = {
    val path = s"$root/${monthFileName(yearMonth)}"
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)
    path
  }
}
