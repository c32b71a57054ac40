package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Queries are fully materialized through the
  * `noop` sink (evaluates all columns, no disk write — `count()` would let
  * Catalyst prune the actual work away). One warmup run pays the JVM/codegen
  * tax outside the timed region.
  *
  * Each query runs TWICE back-to-back and reports the MIN: BENCH_r02 showed
  * 8–13× swings on queries whose code had not changed (GC/old-gen pressure
  * from heavy predecessors, sandbox noise), so a single sample conflates the
  * query's cost with its neighbors' garbage. The min of two consecutive runs
  * is the steady-state number the 100 TB plan comparison needs.
  * SPARK_GRAFT_ONLY=q1,q2 restricts to a subset for local iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JIT + codegen + parquet footer caches, untimed
    materialize("wau_user")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // a typo'd name would otherwise silently shrink the run to a partial
    // bench that still writes a plausible-looking result file
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Between timed runs: drop any cache the previous query left behind and
    // nudge the ContextCleaner (localCheckpoint blocks are freed only when
    // the driver GC collects the dead RDD). BENCH_r04's 2.5× swing on
    // dedup_embedding_cosine_lsh (12.2 s recorded vs 5.0 s isolated, code
    // unchanged) was exactly this neighbor-garbage class.
    def quiesce(): Unit = {
      spark.sqlContext.clearCache()
      System.gc()
    }
    val results = names.map { n =>
      val a = materialize(n)
      quiesce()
      val b = materialize(n)
      quiesce()
      // min of two consecutive runs; a failure (-1) on either run is LOUD
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // A failed query must be LOUD: it is excluded from `total` (marked -1 in
    // `queries`), so without the failure count + nonzero exit a regression
    // would read as a faster run.
    val failed = results.collect { case (n, v) if v < 0 => n }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def line(fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","failures":${failed.size},"failed":$failedJson}"""
    }
    // Full precision to a repo-local file (survives any stdout truncation)…
    scala.util.Try(Files.writeString(Paths.get("BENCH_DETAIL.json"), line(_.toString) + "\n"))
    spark.stop()
    // …the full per-query line to stdout for the human-readable record…
    println(line(v => f"$v%.3f"))
    // …and as the LAST stdout bytes, a line GUARANTEED to fit the driver's
    // 2000-char tail capture (json.loads of the final line). BENCH_r08 died
    // exactly here: at 148 queries the full line is ~3.5 KB, so the captured
    // tail started mid-line and parsed as null. Totals lead; the queries map
    // keeps only the SLOWEST entries that fit the budget (the ones a plan
    // review needs); the full map lives in BENCH_DETAIL.json and the line
    // above. `elided` says how many were dropped so a short map can't read
    // as a short run.
    val budget = 1900
    val slowestFirst = results.sortBy { case (_, v) => if (v < 0) Double.MaxValue else -v }
    def compact(kept: Seq[(String, Double)]): String = {
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","sf":"$sfDir","failures":${failed.size},"failed":$failedJson,"n_queries":${results.size},"elided":${results.size - kept.size},"detail":"BENCH_DETAIL.json","queries":$qs}"""
    }
    var keep = slowestFirst.length
    while (keep > 0 && compact(slowestFirst.take(keep)).length > budget) keep -= 1
    println(compact(slowestFirst.take(keep)))
    if (failed.nonEmpty) sys.exit(1)
  }
}
