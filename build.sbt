ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyschemaspark"
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
// BENCH_r04 post-mortem (4th round of `parsed:null`): sbt decorates forked
// stdout with an `[info] ` prefix and appends its own `[success] Total
// time…` line, so the driver's tail parser never sees a bare JSON line.
// StdoutOutput passes the forked JVM's stdout/stderr through UNDECORATED,
// and showSuccess kills the trailing banner — the bench headline JSON
// becomes the literal last stdout line of `sbt "runMain graft.Bench"`.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// BENCH_r02 post-mortem: the driver environment carries SPARK_LOCAL_DIRS,
// which outranks the -Dspark.local.dir pin below (Spark
// Utils.getConfiguredLocalDirs precedence) — the r2 bench died on /tmp
// garbage-collection mid-run because its block manager silently used
// /tmp/spark-local. Pin the ENV VAR for every forked JVM so no caller
// environment can route shuffle files back into /tmp.
run / envVars += ("SPARK_LOCAL_DIRS" -> file("target/sparktmp").getAbsolutePath)
Test / envVars += ("SPARK_LOCAL_DIRS" -> file("target/sparktmp").getAbsolutePath)
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
// This sandbox VM serves first-touch page faults ~100x slower than warm
// memory access and nearly serially (mmap lock) — a lazily-committed heap
// makes any multi-GB Spark job fault-bound and ANTI-scale with thread
// count. AlwaysPreTouch moves the fault cost to COMMIT time: the Xms
// portion at JVM startup, each later G1 expansion when it happens. Xms is
// kept small (fast startup for tests/Verify) while Xmx is large enough
// that the 2×10^8-row bench suite's final uniqueness aggregate
// (~20 GB of hash-map state at 8 reducers) never spills: the bench's
// untimed warmup rep absorbs the heap-growth faults, timed reps run on
// the warm, pre-touched heap.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // producer/consumer fusion of generated-array checks (graft.plans)
  "-Dspark.sql.extensions=graft.plans.GraftExtensions",
  // private shuffle dir: /tmp on this host is garbage-collected while
  // long jobs run (vanished temp_shuffle files killed two bench runs)
  s"-Dspark.local.dir=${file("target/sparktmp").getAbsolutePath}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS", "8g")}",
  "-XX:+AlwaysPreTouch",
)
