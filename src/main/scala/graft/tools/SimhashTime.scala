package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("dedup_simhash_pairs")(spark, "/root/testdata/sf0.1").count()
      println(f"simhash run $i: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
