ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions += "-deprecation"
name := "verifyspark"
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
// This host's first-touch page-fault throughput is ~0.5-2 GB/s and does NOT
// scale with threads (VM memory ballooning), while steady-state bandwidth
// scales to ~80 GB/s. A lazily-grown heap therefore causes multi-second GC
// pauses as collections copy into never-touched pages. Fix: fixed-size,
// pre-touched heap — pages fault once at JVM start, GC runs on warm pages.
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
// half the heap as a FIXED young gen: adaptive sizing uncommits/recommits
// pages, re-triggering the slow first-touch faults. Accepts any JVM size
// suffix (g/m/k/bytes).
val youngGen = {
  val m = "(?i)^(\\d+)([gmk]?)$".r
  driverMem.trim match {
    case m(n, u) =>
      val mb = u.toLowerCase match {
        case "g" => n.toLong * 1024
        case "m" => n.toLong
        case "k" => math.max(n.toLong / 1024, 1)
        case _ => math.max(n.toLong / (1024 * 1024), 1)
      }
      s"${math.max(mb / 2, 256)}m"
    case _ => "4g" // unparseable: safe fixed default
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
  s"-Xmn$youngGen",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
  "-XX:-UseAdaptiveSizePolicy",
)
