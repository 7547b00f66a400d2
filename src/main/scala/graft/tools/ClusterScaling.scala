package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Bench

/** Scaling leg runner that accepts an arbitrary master string, so the
  * north-rule N -> 4N comparison can be run BOTH as a single shared JVM
  * (`local[N]`) and as genuinely separate executor JVMs
  * (`local-cluster[numExecutors,coresEach,memMb]` — Spark's pseudo-cluster:
  * real Worker-launched executor processes, each with its own heap and GC,
  * exchanging blocks over the local loopback). This tests the round-2
  * hypothesis that the 0.644 efficiency at 8 -> 32 shared-JVM cores is a
  * shared-heap/GC artifact, not a property of the validation plan (which is
  * shuffle-free per row).
  *
  *   runMain graft.tools.ClusterScaling <master> <totalCores> [nDocs]
  *
  * One leg per JVM invocation (fresh codegen/page-cache state per leg, like
  * ScalingBench's per-leg sessions); prints one JSON line. The executor
  * classpath points at the sbt class directory — executors are separate
  * processes and do not inherit the driver's classloader.
  */
object ClusterScaling {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val cores = args(1).toInt
    val nDocs = if (args.length > 2) args(2).toLong else 76800000L
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-scaling")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      builder
        .config("spark.executor.extraClassPath",
          sys.env.getOrElse("GRAFT_CLASSES_DIR",
            new java.io.File(Bench.getClass.getProtectionDomain
              .getCodeSource.getLocation.toURI).getAbsolutePath))
        // same heap policy as build.sbt: fully pre-touched, working-set-sized
        .config("spark.executor.memory", sys.env.getOrElse("GRAFT_EXEC_MEM", "4g"))
        .config("spark.executor.extraJavaOptions", s"-Xms${sys.env.getOrElse("GRAFT_EXEC_MEM", "4g")} -XX:+AlwaysPreTouch")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Bench.ensureCorpus(spark, nDocs, files = 128)
    Bench.timeValidate(spark, dir) // warm-up (page cache, JIT, codegen)
    val secs = (1 to 2).map(_ => Bench.timeValidate(spark, dir)._1).min
    println(f"""{"metric":"cluster_scaling_leg","master":"$master","cores":$cores,"docs":$nDocs,"sec":$secs%.2f,"docs_per_sec":${nDocs / secs}%.0f}""")
    spark.stop()
  }
}
