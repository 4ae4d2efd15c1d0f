ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "derealtimevotingspark"
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
// The driver's bench snapshot parses the LAST stdout line, but with
// `run / fork := true` the forked graft.Bench JVM always finishes
// before sbt prints its `[success]` banner — so the metrics JSON was
// never last and BENCH_r13.json carried "parsed": null. Bench writes
// its compact metrics line to a sidecar (BENCH_LAST.json); this hook
// runs in sbt's OWN JVM as it exits — i.e. AFTER the banner — and
// re-prints that line, making it the snapshot's final parseable line.
// Guards: only fires when a bench target dir is set (never pollutes
// compile/test/Verify output) and only for a sidecar written during
// THIS sbt invocation (mtime >= JVM start; a stale file from an
// earlier run is ignored). Raw FileDescriptor.out sidesteps any
// stream sbt has closed or rewrapped by shutdown time.
val benchLastReprintHook: Unit = {
  val sbtJvmStartMs = System.currentTimeMillis()
  if (sys.env.contains("SPARK_GRAFT_SF_DIR")) {
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try {
        val p = java.nio.file.Paths
          .get(sys.env.getOrElse("SPARK_GRAFT_BENCH_LAST", "BENCH_LAST.json"))
          .toAbsolutePath
        if (java.nio.file.Files.exists(p) &&
            java.nio.file.Files.getLastModifiedTime(p).toMillis >= sbtJvmStartMs) {
          val line = new String(
            java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8).trim
          if (line.startsWith("{")) {
            val out = new java.io.PrintStream(
              new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
            out.println(line)
            out.flush()
          }
        }
      } catch { case _: Throwable => () } // a failed re-print must never fail the build
    }))
  }
}
