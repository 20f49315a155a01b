ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkbestfitspark"
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
// The driver parses Bench's one-line JSON from stdout; sbt's default
// LoggedOutput prefixes forked stdout with "[info] ", which breaks the
// parse. StdoutOutput passes the forked process's stdout through raw.
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
val baseJvmOpts = jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // ~40 harness queries × whole-stage codegen generate hundreds of
  // classes; keep the code cache out of the way.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
// NOTE on this VM: guest RAM faults in at ~40 MB/s on first touch AND
// freed memory is continuously reclaimed by the sandbox (balloon /
// free-page reporting), so warmth decays within minutes. For the TIMED
// mains (Bench/Verify via `run`) the only stable configuration is a
// fixed, fully-pretouched heap the JVM never shrinks: Xms = Xmx +
// AlwaysPreTouch + ParallelGC (G1 uncommits idle regions, handing them
// straight back to the reclaimer). The pretouch costs ~5 min of startup
// — untimed, and worth it: without it, mid-query young-gen growth froze
// the whole process for minutes (r1/r2 driver benches were 14× slower).
run / javaOptions := baseJvmOpts ++ Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
)
// Tests don't need stall-free timing — plain lazy heap keeps their
// startup fast.
Test / javaOptions := baseJvmOpts ++ Seq("-Xmx8g")
