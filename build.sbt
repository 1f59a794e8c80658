ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gmallflink230422spark"
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
// The driver greps `runMain graft.Bench` stdout for the one-line result
// JSON; sbt's default logger prefixes forwarded output with "[info] ",
// which breaks its parser (BENCH_r01 "parsed": null). StdoutOutput passes
// the forked JVM's stdout through verbatim.
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
  // pin the JVM default zone too: driver-side java.time/Timestamp paths
  // must bucket days identically on any host (StatefulOps.dayOf is
  // zone-explicit regardless; this is belt-and-braces)
  "-Duser.timezone=UTC",
  // 96g default (host: 128 GiB): the ×10 bench leg's 17-query DAG gate
  // hit "GC overhead limit exceeded" at 24g AND at 48g — millions of
  // in-flight JSON envelope strings across concurrent micro-batches are
  // allocation churn, not evictable storage. The structural fix is the
  // corpus-scaled feed chunking in DagRun (bounded micro-batches); the
  // big heap is headroom on top, RocksDB keeps state native either way
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "96g")}",
  // hundreds of janino-generated classes across 30+ queries overflow the
  // default 240m code cache → sweeper/deopt churn and erratic stalls
  "-XX:ReservedCodeCacheSize=1g",
  // G1 on a large heap grows young-gen until survivor copying costs
  // ~600 ms per young GC (measured); throughput GC keeps batch runs flat
  "-XX:+UseParallelGC",
) ++
  // GRAFT_LISTENERS=graft.tools.ProgressLog → per-micro-batch trigger/
  // addBatch/state-commit lines on stderr; the STATIC conf (unlike
  // spark.streams.addListener) also covers the harness's cloned sessions
  sys.env.get("GRAFT_LISTENERS")
    .map(l => s"-Dspark.sql.streaming.streamingQueryListeners=$l").toSeq
