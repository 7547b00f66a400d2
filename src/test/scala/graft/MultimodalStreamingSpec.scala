package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.Synth
import graft.ops.Multimodal
import graft.streaming.StreamingValidation

class MultimodalStreamingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  test("multimodal: feature extraction is deterministic, batched, and schema-typed") {
    val assets = Multimodal.syntheticCatalog(spark, 200)
    val f1 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets.repartition(7)).orderBy("asset_id").collect()
    assert(f1.length == 200)
    assert(f1.map(_.getSeq[Float](2)).head.size == Multimodal.FeatureDim)
    // partitioning must not change results
    assert(f1.map(r => (r.getString(0), r.getSeq[Float](2))).toSeq ==
      f2.map(r => (r.getString(0), r.getSeq[Float](2))).toSeq)
  }

  test("multimodal: frame sampling fans out only video assets, per metadata") {
    val assets = Multimodal.syntheticCatalog(spark, 99).toDF()
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000)
    val videos = assets.where($"kind" === "video")
      .select($"asset_id", (col("duration_ms") / 1000 + 1).cast("long").as("expected"))
    val got = frames.groupBy($"asset_id").agg(count(lit(1)).as("n"))
    val joined = videos.join(got, "asset_id")
      .where($"n" =!= $"expected")
    assert(joined.count() == 0)
    assert(frames.select("asset_id").distinct().count() == videos.count())
  }

  test("multimodal: media stats prune the binary column from the scan") {
    val dir = Files.createTempDirectory("graft-media").toString
    Multimodal.syntheticCatalog(spark, 50).write.mode("overwrite").parquet(dir)
    val stats = Multimodal.mediaStats(
      spark.read.parquet(dir).select($"kind", $"bytes", $"duration_ms"))
    assert(stats.count() == 3)
    val metaOnly = spark.read.parquet(dir)
      .groupBy($"kind").agg(count(lit(1)).as("n"), avg($"duration_ms").as("a"))
    val plan = metaOnly.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("bytes"),
      s"binary not pruned:\n$plan")
  }

  test("streaming: file-source validation produces the same verdicts as batch") {
    val dir = Files.createTempDirectory("graft-stream").toString
    Synth.corpusDF(spark, 90).write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingValidation.verdictStream(stream)
      .writeStream.format("memory").queryName("verdicts_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("verdicts_stream")
      .select("doc_id", "passed", "n_violations")
    val batch = graft.checks.RowValidator.verdicts(spark.read.parquet(s"$dir/in"))
    assert(streamed.count() == 90)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming: watermarked windowed violation-rate aggregates by hour") {
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("graft-stream2").toString
    val docs = Synth.corpusDF(spark, 90)
      .withColumn("ts", timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2026-01-01 00:00:00"))) +
          (col("doc_id").substr(lit(5), lit(10)).cast("long") % 180) * 60))
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = StreamingValidation.windowedViolationRate(stream, "ts")
      .writeStream.format("memory").queryName("rate_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("rate_stream").collect()
    // 3 hour-windows x (passed, failed) = up to 6 groups, counts sum to 90
    assert(out.map(_.getAs[Long]("n")).sum == 90)
    assert(out.length >= 4 && out.length <= 6)
  }
}
