ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sedbinningspark"
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
// local-cluster[…] masters launch executor JVMs through the SPARK_HOME
// launcher, whose Scala-version autodetect only understands source
// checkouts ("Cannot find any build directories"); pin it for the
// binary dist at /opt/spark.
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
run / envVars += "SPARK_SCALA_VERSION" -> "2.13"
// ClusterSmokeSpec boots a local-cluster[2,…] master (separate executor
// processes). A JVM can hold only one SparkContext and the shared test
// session is local[4], so that suite gets its own forked JVM.
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
  val (cluster, rest) = (Test / definedTests).value
    .partition(_.name == "graft.cluster.ClusterSmokeSpec")
  Seq(Tests.Group("rest", rest, Tests.SubProcess(opts))) ++
    (if (cluster.nonEmpty)
      Seq(Tests.Group("cluster", cluster, Tests.SubProcess(opts)))
    else Nil)
}
// Forked run output must reach stdout RAW (no "[info] " logger prefix):
// the round driver parses Bench's one-line JSON from stdout, and sbt's
// default LoggedOutput strategy breaks that (BENCH_r{1,2}.json: parsed=null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
