package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Packing, Sampling, TextAnalysis}

/** Scale smoke for the round-5 corpus-shaping operators: runs each one over
  * the synthetic interleaved corpus (250x the sf0.1 driver-bench documents
  * table) and prints per-op wall time + docs/sec, bracketed by the same
  * pure-CPU control [[Control.hashRate]] the main bench uses so a reading
  * is interpretable under this host's memory weather.
  *
  *   runMain graft.tools.CorpusOpsScale [nDocs] [cpus]
  */
object CorpusOpsScale {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 19200000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-corpus-ops-scale")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.Bench.ensureCorpus(spark, nDocs, files = cpus * 2)

    val ctlPre = Control.hashRate(spark, cpus)
    def time(tag: String)(body: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"OPSCALE $tag $s%.1f s, $rows rows, ${nDocs / s}%.0f docs/s")
      (tag, s, rows)
    }

    // doc-level text view: spans concatenated (the shape every text op runs
    // on when the interleaved table is flattened for curation)
    def docs = spark.read.parquet(dir)
      .select(col("doc_id"),
        concat_ws(" ", transform(col("spans"), s => s.getField("text"))).as("text"))

    val results = Seq(
      time("stratified_sample") {
        Sampling.stratifiedSampleByHash(docs, col("doc_id"),
          substring(col("doc_id"), 1, 6), Map("doc-00" -> 0.5), 0.1, "sc")
          .count()
      },
      time("pack_sequences") {
        Packing.packSequences(
          docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
          xxhash64(col("doc_id")), col("n"), capacity = 2048, buckets = cpus * 8)
          .count()
      },
      time("cap_per_group") {
        // group = a 64-way split of a SINGLE synthetic hot domain plus the
        // doc tail: ~300k docs/group, cap 1000
        Sampling.capPerGroup(
          docs.select(pmod(xxhash64(col("doc_id")), lit(64)).as("g"),
            xxhash64(col("doc_id")).as("id")),
          col("g"), col("id"), 1000).count()
      },
      time("line_dedup_intra") {
        Dedup.lineDedupIntra(
          docs.select(col("doc_id"), regexp_replace(col("text"), " ", "\n").as("t")),
          col("doc_id"), col("t")).select(sum(col("n_dropped"))).collect()
          .head.getLong(0)
      })
    val ctlPost = Control.hashRate(spark, cpus)

    val qs = results.map { case (t, s, _) => f""""$t":$s%.2f""" }.mkString(",")
    println(f"""{"metric":"corpus_ops_scale","docs":$nDocs,"cpus":$cpus,"ops":{$qs},"control_ghash_pre":${ctlPre / 1e9}%.3f,"control_ghash_post":${ctlPost / 1e9}%.3f}""")
    spark.stop()
  }
}
