ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rabbitinablenderspark"
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
// Forked run output goes straight to stdout (no sbt "[info] " prefix) so
// the driver can parse Bench's single JSON line.
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
  // local[32] runs driver+executor threads in ONE JVM. The heap size is a
  // balance: 8g GC-thrashes once a few dozen queries' broadcasts/codegen
  // classes accumulate (bench totals swung 45s -> 169s), while 24g makes GC
  // so RARE that dead ThreadLocal entries on the long-lived executor
  // threads are never expunged (weak refs only clear on GC) and per-row
  // ThreadLocal lookups degrade to linear scans — watchdog stack dumps
  // showed Jackson's BufferRecycler spinning in getEntryAfterMiss for 25s
  // on a 100k-row json query. 12g keeps GC frequent enough to clear the
  // maps and roomy enough not to thrash: sf0.1 bench 263s -> ~75s, stable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // ~60 queries in one JVM generate fresh codegen classes faster than the
  // default C2 compiler threads can chew: whichever query runs during the
  // backlog executes interpreted and pays a 10x stall (observed 55s for a
  // 100k-row projection). More JIT threads keep compilation off the
  // critical path on this 32-core box (sf0.1 bench total: 263s -> 121s).
  "-XX:CICompilerCount=12",
  // 78 queries' generated classes overflow the default 240m code cache;
  // once it fills the JIT disables ("CodeCache is full") and every later
  // query runs interpreted — observed as 3-6x inflation of the same query
  // in the full bench vs standalone (etl_two_stage 26s -> 67s,
  // dedup_jaccard_pairs 6s -> 40s). Size it so compilation never stops.
  "-XX:ReservedCodeCacheSize=768m",
)
