package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Timing harness for minhashPairs at sf0.1 (throwaway diagnostics): one
  * cold + warm pair per JVM so numbers aren't polluted by earlier plans.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val n1 = time("cold fanout32") {
      Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold = 0.8,
        inputPartitions = 32).count()
    }
    val n2 = time("warm fanout32") {
      Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold = 0.8,
        inputPartitions = 32).count()
    }
    val n3 = time("ngram prefix-filtered") {
      Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), threshold = 0.8).count()
    }
    val pairs = Dedup.minhashPairs(docs, col("doc_id"), col("text"), threshold = 0.8,
      inputPartitions = 32).select(col("a"), col("b"))
    val n4 = time("pairs precomputed") { pairs.count() }
    val n5 = time("clusters") { Dedup.dupClusters(pairs).count() }
    println(s"pairs: $n1 / $n2 / $n3 / $n4 / clusters $n5")
    spark.stop()
  }
}
