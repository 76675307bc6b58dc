ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "marketdbspark"
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
// Run the suites in N forked JVMs concurrently instead of one
// sequential JVM: each suite owns its scratch paths (per-suite-named
// /tmp dirs or createTempDirectory) and builds its own local[4]
// session, so groups are independent; N*4 cores stays within the box.
// Round-robin over the name-sorted list spreads the heavy
// BucketedLog*/Inverted* families across groups.
val testForkGroups = sys.env.getOrElse("SPARK_GRAFT_TEST_JVMS", "6").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val forkOpts = (Test / forkOptions).value
  tests.zipWithIndex.groupBy(_._2 % testForkGroups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"fork-$i", ts.map(_._1), Tests.SubProcess(forkOpts))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkGroups),
  Tags.limitAll(testForkGroups + 2),
)
