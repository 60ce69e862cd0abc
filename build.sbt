ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "neo4jdatabasetodataimporterpackagespark"
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
// Forked app output goes STRAIGHT to stdout, un-prefixed: the bench
// harness prints one JSON line that downstream tooling parses, and
// sbt's default logger would wrap it as "[info] {...}", breaking any
// line-oriented JSON consumer.
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
  // local[32] benchmarks need real heap: the r7 driver run was silently
  // capped at 4 GB and its medians showed 4× contention spreads. The
  // bench JSON records Runtime.maxMemory as jvm_max_heap so a capped run
  // is diagnosable from the artifact alone.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // JDK-8192647 class: under parquet/codec JNI critical sections G1's
  // GCLocker gives up after 2 retry allocations and throws a SPURIOUS
  // OutOfMemoryError while the heap has tens of GB free — observed in
  // the r13 sf10 probes as "Retried waiting for GCLocker too often
  // allocating 33554434 words" immediately before OOMs in runs that were
  // green in r12 (125 GiB machine, 17 GB heap, byte-identical plans).
  // Raising the retry budget only changes failure behavior of those
  // retries, never measured bytes or plan shape.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
) ++ sys.env.get("GRAFT_DEBUG_PROPS").toSeq
  .flatMap(_.split(',').toSeq.map(p => s"-D$p"))
