package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.checks.RowValidator

/** Degradation probe: same-codegen-class reps vs fresh-class reps. */
object Exp3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val cores = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rep(tag: String, i: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"EXP3 $tag rep=$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val mode = if (args.length > 2) args(2) else "same"
    mode match {
      case "same" =>
        for (i <- 1 to 5) rep("same_class", i) {
          RowValidator.withViolations(spark.read.parquet(dir))
            .agg(sum(size(col("violations")))).collect().head.getLong(0)
        }
      case "fresh" =>
        for (i <- 1 to 5) rep("fresh_class", i) {
          // unique literal -> unique codegen source -> fresh GeneratedClass
          RowValidator.withViolations(spark.read.parquet(dir))
            .agg((sum(size(col("violations"))) + lit(i * 1000000L)).as("s"))
            .collect().head.getLong(0) - i * 1000000L
        }
    }
    spark.stop()
  }
}
