package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.checks.RowValidator

/** Ad-hoc profiling: scan-only vs validate throughput at a given core count.
  *   Profile <corpusDir> <cores> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val cores = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader",
        sys.env.getOrElse("NESTED_VEC", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"PROF nestedVectorized=" + spark.conf.get(
      "spark.sql.parquet.enableNestedColumnVectorizedReader"))
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.minBy(_._1)
      println(f"PROF $tag cores=$cores best=${best._1}%.2fs rows=${best._2} rate=${best._2 / best._1}%.0f/s")
    }
    val df = spark.read.parquet(dir)
    time("scan_count") { df.count() }
    time("scan_spans") { df.select(sum(size(col("spans")))).collect().head.getLong(0) }
    time("scan_texts") {
      df.select(sum(length(element_at(col("spans.text"), 1)))).collect().head.getLong(0)
    }
    time("validate_nviol") {
      RowValidator.withViolations(df)
        .agg(sum(size(col("violations")))).collect().head.getLong(0)
    }
    spark.stop()
  }
}
