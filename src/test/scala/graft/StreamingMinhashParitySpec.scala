package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.streaming.StreamingValidation

/** Batch-parity oracle for the streaming minhash candidate generator: the
  * same corpus, split into micro-batches, must surface every pair the batch
  * operator ([[Dedup.minhashPairs]]) verifies as a true near-duplicate —
  * including pairs whose members arrive in DIFFERENT micro-batches — and
  * must never surface junk below the estimate margin. The driver's DuckDB
  * oracle cannot exercise streaming, so this spec is that contract.
  */
class StreamingMinhashParitySpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  /** 6 near-dup groups (clone + one-token append => jaccard 1.0 / ~0.97)
    * plus 20 all-distinct docs; vocabularies are disjoint across groups.
    */
  private lazy val corpus: Seq[(String, String)] = {
    val groups = (0 until 6).flatMap { g =>
      val base = (0 until 30).map(i => s"g${g}tok$i").mkString(" ")
      Seq((f"d$g%02d_0", base), (f"d$g%02d_1", base), (f"d$g%02d_2", base + " extra"))
    }
    val uniques = (0 until 20).map { u =>
      (f"u$u%02d", (0 until 30).map(i => s"u${u}only$i").mkString(" "))
    }
    groups ++ uniques
  }

  /** Run the streaming op over `batches` micro-batches, return the distinct
    * candidate pair set.
    */
  private def streamCandidates(docs: Seq[(String, String)], nBatches: Int,
      maxBucket: Int = 4096): Set[(String, String)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val stream = StreamingValidation.nearDupCandidatesStream(
      input.toDF().toDF("doc_id", "text", "ts"),
      col("doc_id"), col("text"), "ts", maxBucket = maxBucket)
    val name = s"minhash_parity_${nBatches}_$maxBucket"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // round-robin split => every near-dup group spans several batches
      docs.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .foreach { case (_, chunk) =>
          input.addData(chunk.map { case ((id, text), i) => (id, text, t(i % 60)) })
          q.processAllAvailable()
        }
      spark.table(name).select("a", "b").distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    } finally q.stop()
  }

  test("streaming candidates cover every batch-verified pair across micro-batches") {
    val docs = corpus.toDF("doc_id", "text")
    val truePairs = Dedup.minhashPairs(docs, $"doc_id", $"text", threshold = 0.8)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // sanity on the fixture: all 3 pairs per group, nothing else
    assert(truePairs.size == 18, s"fixture drift: $truePairs")

    val streamed = streamCandidates(corpus, nBatches = 4)
    assert(truePairs.subsetOf(streamed),
      s"missed pairs: ${truePairs -- streamed}")
    // at least one covered pair is genuinely cross-batch (round-robin puts
    // dXX_0 and dXX_1 in consecutive batches)
    assert(truePairs.exists { case (a, b) =>
      corpus.indexWhere(_._1 == a) % 4 != corpus.indexWhere(_._1 == b) % 4 })

    // precision side: no candidate joins docs from different groups or any
    // unique doc — disjoint vocabularies can't reach est >= thresh - margin
    streamed.foreach { case (a, b) =>
      assert(a.take(3) == b.take(3) && a.startsWith("d"), s"junk candidate ($a, $b)")
    }
  }

  test("bucket cap bounds state and candidate volume under a mass-duplicate flood") {
    // 40 identical docs arriving over 5 batches into capped (maxBucket=2)
    // buckets: every band bucket keeps 2 residents, each arrival compares
    // against <= 2, so candidates grow LINEARLY in arrivals — the flood
    // cannot go quadratic through state, and cross-batch arrivals still
    // pair with the capped residents
    val flood = (0 until 40).map(i => (f"f$i%02d", "same boilerplate " * 10))
    val streamed = streamCandidates(flood, nBatches = 5, maxBucket = 2)
    // residents are the 2 earliest ARRIVALS per bucket; the round-robin
    // split puts f00 and f05 in micro-batch 0, so they own every bucket
    // (identical signature => same bucket in every band) and all candidates
    // pair against one of them
    val residents = flood.zipWithIndex.filter(_._2 % 5 == 0).take(2).map(_._1._1).toSet
    assert(streamed.nonEmpty)
    assert(streamed.forall { case (a, b) =>
      residents.contains(a) || residents.contains(b) },
      s"capped bucket leaked residents (expected all pairs to touch " +
        s"$residents): $streamed")
    // linear bound: <= 2 candidates per arriving doc (vs C(40,2)=780 uncapped)
    assert(streamed.size <= 2 * flood.size, s"quadratic blowup: ${streamed.size}")
    // cross-batch coverage: a doc from the LAST batch (f35..f39) paired
    assert(streamed.exists { case (a, b) => a >= "f35" || b >= "f35" })
  }
}
