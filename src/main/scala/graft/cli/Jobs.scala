package graft.cli

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}
import graft.operators.EventsEtl

/** CLI entry points mirroring the reference's three spark-submit jobs
  * (`/root/reference/src/main/scala/transformer/DataLoadTransformer.scala:21`,
  * `UserIdBaseWauTransformer.scala:10`, `SessionIdBaseWauTransformer.scala:10`):
  * an ETL load taking `yyyy-MM` month arguments, and two WAU reports taking
  * `(startDate, endDate)` that print to the console sink (`show()` — the
  * reference's S8 output). Environment knobs instead of a hive metastore:
  * `GRAFT_SF_DIR` (events parquet location) and `GRAFT_TABLE` (target table).
  */
object Jobs {
  private[cli] def sfDir: String = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private[cli] def tableName: String = sys.env.getOrElse("GRAFT_TABLE", "user_activity")

  /** `yyyy-MM` → the month's `[first-day 00:00, next-month first-day)` UTC range. */
  private[cli] def monthRange(month: String): (String, String) = {
    val ym = java.time.YearMonth.parse(month)
    (s"${ym.atDay(1)} 00:00:00", s"${ym.plusMonths(1).atDay(1)} 00:00:00")
  }
}

/** Sessionize-and-load for a list of `yyyy-MM` months (any order, gaps OK —
  * contiguous months merge into single runs exactly like the reference's
  * `UserActivityHiveConnector.scala:44-59` grouping).
  */
object LoadJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LoadJob <yyyy-MM> [<yyyy-MM> ...]")
    val spark = GraftSession.local(appName = "graft-load")
    val table = EventsEtl.manager(Jobs.tableName)
    EventsEtl.loadBatches(
      spark, table, Tables.events(spark, Jobs.sfDir), args.toSeq.map(Jobs.monthRange))
    println(s"loaded ${args.sorted.mkString(", ")} into ${Jobs.tableName}")
    spark.stop()
  }
}

/** WAU report printed to the console sink — templated SQL over the loaded
  * table, the reference's exact query shape (`{TABLE}` substitution).
  */
private[cli] object WauReport {
  def run(spark: SparkSession, keyCol: String, startDate: String, endDate: String): Unit =
    EventsEtl.manager(Jobs.tableName).extract(
      spark,
      s"""WITH activity_with_week AS (
         |  SELECT $keyCol, DATE_TRUNC('WEEK', event_date_kst) AS event_week
         |  FROM {TABLE}
         |)
         |SELECT CAST(event_week AS DATE) AS event_week,
         |       COUNT(DISTINCT $keyCol) AS wau
         |FROM activity_with_week
         |WHERE event_week >= DATE_TRUNC('WEEK', CAST('$startDate' AS DATE))
         |  AND event_week <= DATE_TRUNC('WEEK', CAST('$endDate' AS DATE))
         |GROUP BY event_week
         |ORDER BY event_week ASC""".stripMargin
    ).show(false) // S8: console sink
}

/** WAU by user id over the loaded activity table: `main(startDate, endDate)`. */
object UserWauJob {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: UserWauJob <startDate> <endDate>")
    val spark = GraftSession.local(appName = "graft-wau-user")
    WauReport.run(spark, "user_id", args(0), args(1))
    spark.stop()
  }
}

/** WAU by session id over the loaded activity table: `main(startDate, endDate)`. */
object SessionWauJob {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SessionWauJob <startDate> <endDate>")
    val spark = GraftSession.local(appName = "graft-wau-session")
    WauReport.run(spark, "session_id", args(0), args(1))
    spark.stop()
  }
}
