ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "manipulaodedataframesspark"
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
// Pass the forked program's stdout through raw (no "[info]" prefix):
// the driver parses graft.Bench's one-line metric JSON from stdout.
run / outputStrategy := Some(StdoutOutput)
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
  // 32g default: the sf0.1 bench caches the fact view + shuffles and the
  // sink round-trip query rewrites the whole fact per pass — at 8g the
  // cached fact was evicted between passes and trivial queries paid a
  // full 5-way-join rebuild (measured: a12_distinct_sorted 0.7s -> 12s).
  // The test box has 128 GiB; a real cluster sizes executor memory anyway.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 77 queries × whole-stage codegen generates a lot of nmethods; the
  // 240m default leaves little headroom before the JIT stops compiling
  // and hot interpreted-eval loops (ObjectHashAggregate update) run
  // 20×+ slower. Cheap insurance for a single-JVM 32-thread bench.
  "-XX:ReservedCodeCacheSize=512m",
)
