package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Control experiment: pure-CPU scaling (no IO, no nested types). */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("CPUSCALE_N", "16000000000").toLong
    def run(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      def once(): Double = {
        val t0 = System.nanoTime()
        s.range(0, n, 1, cores * 4).select(sum(xxhash64(col("id")) / lit(1e9))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); val best = Seq(once(), once()).min
      s.stop()
      println(f"CPUSCALE cores=$cores best=$best%.2fs rate=${n / best / 1e6}%.0fM/s")
      n / best
    }
    val r8 = run(8); val r32 = run(32)
    println(f"CPUSCALE efficiency=${(r32 / r8) / 4}%.3f")
  }
}
