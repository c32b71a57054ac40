ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkhivedemospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver json.loads the bench's final stdout line verbatim; sbt's
// default LoggedOutput "[info] " prefix and the "[success] Total time"
// banner both corrupt it (BENCH_r01–r04 all record parsed:null). Forward
// the forked JVM's streams raw and drop the banner so the JSON line is
// the last bytes on stdout.
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// The Hive suite needs spark.sql.catalogImplementation=hive — a STATIC conf
// fixed by the first SparkSession of a JVM — so it runs in its own forked
// JVM, apart from the shared in-memory-catalog SparkTestSession. sbt's
// default ForkedTestGroup tag keeps the groups sequential.
Test / testGrouping := {
  val (hive, rest) = (Test / definedTests).value.partition(_.name.contains("Hive"))
  val fo = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  Seq(
    Tests.Group("rest", rest, Tests.SubProcess(fo)),
    Tests.Group("hive", hive, Tests.SubProcess(fo))).filter(_.tests.nonEmpty)
}
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
