ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pydanticmarcspark"
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
// Heap policy: this sandbox VM provides anonymous memory at only ~160 MB/s
// (host-side overcommit — measured via -XX:+AlwaysPreTouch RSS growth), so a
// large lazily-touched heap makes G1 fault fresh pages forever and degrades
// Spark jobs 10-45x run-over-run (measured: 8s -> 22s -> 160s for the same
// query at -Xmx48g vs a stable 1.05s at -Xmx6g -Xms6g). Clamp the heap to a
// working-set-sized, fully-pretouched region; -Xms=-Xmx means G1 reuses the
// same resident pages instead of wandering the address space. Override with
// SPARK_GRAFT_FORCE_MEM only for experiments.
val graftHeap: String = {
  def gigs(s: String): Int = s.trim.toLowerCase match {
    case g if g.endsWith("g") => g.dropRight(1).toDouble.toInt
    case m if m.endsWith("m") => math.max(1, m.dropRight(1).toDouble.toInt / 1024)
    case other                => other.toDouble.toInt
  }
  sys.env.get("SPARK_GRAFT_FORCE_MEM").getOrElse {
    val req = sys.env.get("SPARK_DRIVER_MEM").map(gigs).getOrElse(8)
    s"${math.min(math.max(req, 4), 10)}g"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap", s"-Xms$graftHeap", "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
