ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azuredatabrickssharepointonpremisetocloudetlspark"
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
  // local mode = driver-only JVM; with 32 executor threads on a
  // 128 GiB box an 8g heap GC-thrashes the dedup shuffles
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Bench sweeps call System.gc() between queries (so one query's
  // garbage is not the next query's timer); on G1 an explicit gc is
  // otherwise a FULL STW collection of the whole heap — ~100 of them
  // per suite run, growing with heap age, and every pause >150 ms
  // lands in the stall witness. The r9 gc_sec witness measured
  // 18 s/run of collection time against 2.7 s of probe stall on an
  // idle host: the "host stall" was substantially the harness GCing
  // itself. Concurrent explicit GC keeps the hygiene semantics with
  // initial-mark-sized pauses.
  "-XX:+ExplicitGCInvokesConcurrent",
  // A 170-query suite's generated classes + Spark internals exceed the
  // JDK-17 default 240 MB reserved code cache: occupancy was measured
  // hovering at 107-147 MB (the flushing zone — the sweeper evicts
  // cold/profiled methods well before the cap) and hot kernels
  // recompiled mid-suite, showing up as multi-10s wall-clock variance
  // with gc/stall/spill all ≈ 0 (q_dedup_incremental 8.7-25.8 s across
  // identical quiet runs; jit witness 5-11 s per sample). Standard
  // production Spark sizing; headroom stops the churn.
  "-XX:ReservedCodeCacheSize=512m",
)
