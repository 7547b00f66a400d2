package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.Drift
import graft.streaming.StreamingValidation

/** End-to-end harness spec for the streaming windowed-PSI drift pipeline
  * ([[StreamingValidation.startWindowedPsiSink]]): closed windows must land
  * exactly once with the FINAL histogram (late-but-in-watermark rows
  * counted, past-watermark rows dropped), and the per-window PSI written at
  * landing time must equal the batch [[Drift.psiGrouped]] over the same
  * landed windows — the streaming/batch parity the driver's batch-only
  * oracle loop cannot check itself.
  */
class StreamingDriftSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private def t(hm: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $hm:00")

  test("sessionSummaries binds to a watermarked stream; closed sessions match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Sessions
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val docs = input.toDF().toDF("u", "ts").withWatermark("ts", "10 minutes")
    val q = Sessions.sessionSummaries(docs, col("u"), col("ts"), "30 minutes")
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    val rows = Seq(
      (1L, t("10:00")), (1L, t("10:20")),      // session A (merged)
      (2L, t("10:05")),                        // session B
      (1L, t("11:30")),                        // session C (gap > 30m)
      (2L, t("13:00")), (1L, t("13:00")))      // advance watermark far enough
    try {
      rows.grouped(2).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("sessions_stream")
      .select("key", "session_start", "session_end", "n_events")
    // batch over the same rows, restricted to sessions the stream CLOSED
    // (watermark reached 12:50, so the 13:00 sessions are still open)
    val batch = Sessions.sessionSummaries(
        rows.toDF("u", "ts"), col("u"), col("ts"), "30 minutes")
      .where(col("session_end") < to_timestamp(lit("2026-01-01 12:50:00")))
    assert(streamed.count() == 3, streamed.collect().mkString(","))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("PSI sink epoch replay is idempotent (re-landing a batch replaces, not appends)") {
    val tmp = Files.createTempDirectory("graft-psi-replay").toString
    val baseline = Seq(("a", 1L), ("b", 1L)).toDF("cat", "n_base")
    def mkBatch(rows: Seq[(String, String, Long)]) =
      rows.toDF("ws", "kind", "n")
        .select(struct(to_timestamp(col("ws")).as("start")).as("window"),
          col("kind"), col("n"))
    val b0 = mkBatch(Seq(("2026-01-01 00:00:00", "a", 3L),
      ("2026-01-01 00:00:00", "b", 1L)))
    val b1 = mkBatch(Seq(("2026-01-01 01:00:00", "a", 2L)))
    graft.streaming.StreamingValidation.landPsiBatch(
      b0, 0L, baseline, s"$tmp/w", s"$tmp/p")
    graft.streaming.StreamingValidation.landPsiBatch(
      b1, 1L, baseline, s"$tmp/w", s"$tmp/p")
    // the crash-replay: epoch 0 re-lands with the same content
    graft.streaming.StreamingValidation.landPsiBatch(
      b0, 0L, baseline, s"$tmp/w", s"$tmp/p")
    val windows = spark.read.parquet(s"$tmp/w")
    assert(windows.count() == 3, "replay duplicated window rows")
    assert(spark.read.parquet(s"$tmp/p").count() == 2, "replay duplicated PSI rows")
    // and epoch 1's rows survived epoch 0's replay (dynamic, not full, overwrite)
    assert(windows.where(col("batch_id") === 1).count() == 1)
  }

  test("stateless curation ops run unchanged on a stream with batch parity") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.ops.{Dedup, Sampling, TextAnalysis}
    // the curation surface is stateless per-row Columns, so the SAME
    // operator calls bind to readStream and must emit byte-identical rows
    val dir = Files.createTempDirectory("graft-curation-stream").toString
    val line = "a sufficiently long repeated line of text"
    spark.range(300).selectExpr("id AS doc_id",
        s"concat('$line\\n$line\\ndoc body token', id % 7) AS text",
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'zh' END AS lang")
      .write.mode("overwrite").parquet(s"$dir/in")
    def curate(df: org.apache.spark.sql.DataFrame) = {
      val sampled = Sampling.stratifiedSampleByHash(df, col("doc_id"),
        col("lang"), Map("en" -> 0.7), defaultRate = 0.3, salt = "sc")
      Dedup.lineDedupIntra(sampled, col("doc_id"), col("text"))
        .withColumn("np",
          TextAnalysis.subwordStats(col("text_clean")).getField("n_pieces"))
    }
    val schema = spark.read.parquet(s"$dir/in").schema
    val q = curate(spark.readStream.schema(schema).parquet(s"$dir/in"))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("curation_stream")
    val batch = curate(spark.read.parquet(s"$dir/in"))
    assert(streamed.count() > 50 && streamed.count() < 250) // sampler really cut
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("closed windows land once with late-data semantics; landed PSI == batch PSI") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-psi-sink").toString
    val (windowsPath, psiPath, ckpt) =
      (s"$tmp/windows", s"$tmp/psi", s"$tmp/ckpt")

    // uniform 2-kind baseline: any landed window scores a finite PSI and
    // single-kind windows score a LARGE one, so parity is value-bearing
    val baseline = Seq(("a", 1L), ("b", 1L)).toDF("cat", "n_base")

    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "k", "ts")
      .select(col("doc_id"), col("ts"),
        array(struct(col("k").as("kind"))).as("spans"))
    val q = StreamingValidation.startWindowedPsiSink(
      docs, "ts", baseline, windowsPath, psiPath, ckpt,
      windowLen = "1 hour", watermark = "30 minutes")
    try {
      // batch 1: W0 gets a+b, W1 gets a; watermark (from prior batches) is
      // still epoch, nothing closes. After: max ts 01:10 -> wm 00:40.
      input.addData(("d1", "a", t("00:10")), ("d2", "b", t("00:20")),
        ("d3", "a", t("01:10")))
      q.processAllAvailable()
      // batch 2: a LATE row for W0 — 00:05 is behind the 00:40 watermark
      // but W0 (end 01:00) is still open, so it must still count — plus a
      // W2 row that advances the watermark to 02:20.
      input.addData(("d4", "b", t("00:05")), ("d5", "a", t("02:50")))
      q.processAllAvailable()
      // batch 3: a TOO-LATE row for W0 (W0 end 01:00 <= wm 02:20 — must be
      // dropped, not resurrect the closed window) plus a W3 row. W0 and W1
      // close THIS batch with their final histograms.
      input.addData(("d6", "a", t("00:15")), ("d7", "b", t("03:40")))
      q.processAllAvailable()
      // two more advancing batches so W2 and W3 close too
      input.addData(("d8", "a", t("05:00")))
      q.processAllAvailable()
      input.addData(("d9", "b", t("06:30")))
      q.processAllAvailable()
    } finally q.stop()

    // landed window histograms: exactly one landing per (window, kind),
    // late-in-watermark counted (W0 b=2), too-late dropped (W0 a stays 1)
    val landed = spark.read.parquet(windowsPath)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    // the trailing no-data batch after the last addData advances the
    // watermark to 06:00, so the 05:00 window closes too
    val expected = Set(
      (t("00:00"), "a", 1L), (t("00:00"), "b", 2L),
      (t("01:00"), "a", 1L),
      (t("02:00"), "a", 1L),
      (t("03:00"), "b", 1L),
      (t("05:00"), "a", 1L))
    assert(landed.length == expected.size, s"duplicate landings: ${landed.toSeq}")
    assert(landed.toSet == expected, s"landed: ${landed.toSeq}")

    // PSI parity: the per-window PSI written at landing time equals the
    // batch psiGrouped over the same landed table (exact doubles — both
    // sides are the same code path over the same histogram rows)
    val streamedPsi = spark.read.parquet(psiPath)
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    val batchPsi = Drift.psiGrouped(
        spark.read.parquet(windowsPath), baseline, col("w"), col("kind"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    assert(streamedPsi.keySet == batchPsi.keySet && streamedPsi.keySet.size == 5)
    streamedPsi.foreach { case (w, psi) =>
      assert(psi == batchPsi(w), s"window $w: streamed $psi vs batch ${batchPsi(w)}")
    }
    // value sanity: the mixed window (W0: a=1,b=2) drifts less against the
    // uniform baseline than the single-kind windows
    val singleKind = Seq(t("01:00"), t("02:00"), t("03:00"), t("05:00"))
    singleKind.foreach { w =>
      assert(streamedPsi(w) > streamedPsi(t("00:00")),
        s"single-kind window $w should out-drift the mixed window")
    }
  }
}
