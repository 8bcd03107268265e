ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "buncsvspark"
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
// forked run writes raw stdout (no "[info] " prefix) so the Bench JSON
// line is machine-parseable from the captured output
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and nothing prints AFTER it: sbt's "[success] Total time" epilogue
// would otherwise be the last stdout line and break last-line JSON
// parsing of the bench output (BENCH_r01–r04 all captured parsed:null)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — lint
// can't see that
Global / excludeLintKeys += showSuccess
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
  // managed-table tests (bucketing) must not drop spark-warehouse/ in cwd
  "-Dspark.sql.warehouse.dir=/tmp/graft_warehouse",
  // pin the JVM locale: java.lang.String.toLowerCase() (Spark's
  // non-ASCII lower() fallback) and %f formatting are locale-sensitive
  // (tr-TR dotless-i, comma decimals) — results must not depend on the
  // box's default locale
  "-Duser.language=en", "-Duser.country=US",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Spark sizes Tungsten pages at 16 MB on this box; G1's default
  // region at a 24 GB heap is also 16 MB, making EVERY page a
  // humongous allocation that needs contiguous regions — after ~100
  // catalog queries the old gen is fragmented and the sf10 census hit
  // GCLocker retries / page-allocation failures (r15 sweep telemetry,
  // PLANS.md q172 section). 32 MB regions put 16 MB pages under the
  // humongous threshold; harmless at small test heaps.
  "-XX:G1HeapRegionSize=32m",
  // Hotspot's GCLocker allocation retry budget defaults to 2: with 32
  // executor threads holding JNI critical sections (parquet/zstd) while
  // others allocate 16 MB Tungsten pages, two retries lose the race and
  // the JVM throws a SPURIOUS OutOfMemoryError with free heap — the
  // r17 sweep-2 failure (q93's verify stage: "Retried waiting for
  // GCLocker too often" across 32 workers, then heap OOM in the
  // Context Cleaner). A larger budget waits out the critical section.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
