package graft

import org.apache.spark.sql.SparkSession

/** Supplementary per-query timing harness for the optimization rounds —
  * graft.Bench is FROZEN (driver contract), so isolation experiments live
  * here. Times each named SparkEntry query `reps` times with the same
  * action the driver uses (`.count()`), printing every sample plus the min,
  * so before/after comparisons for a single operator don't need a full
  * bench pass.
  *
  *   runMain graft.BenchExtra <query> [query ...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 3).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep $i")
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"EXTRA $name rep$i $s%.3fs rows=$n")
        s
      }
      val sorted = samples.sorted
      val median =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2
      println(f"EXTRA $name min ${sorted.head}%.3fs median $median%.3fs")
    }
    spark.stop()
  }
}
