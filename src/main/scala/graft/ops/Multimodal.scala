package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.expr.Mix64

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The actual byte decode is STUBBED (this container ships no image/audio
  * codecs): [[StubCodec.decode]] derives deterministic fake features from
  * the bytes. Everything around it — schema, batching, partition shape,
  * per-asset fan-out — is the real Spark plumbing a codec-backed decoder
  * would drop into (swap StubCodec for the JNI/codec call; the mapPartitions
  * batch loop and the column contracts stay unchanged).
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: String, kind: String, bytes: Array[Byte],
      mime: String, width: Int, height: Int, duration_ms: Long)

  /** Fixed feature width of the stub "decoder". */
  val FeatureDim = 16

  /** Deterministic synthetic asset catalog (no external data): payload bytes
    * derive from the id hash; kind/mime/shape cycle deterministically.
    */
  def syntheticCatalog(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kinds = Seq(("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4"))
      val (kind, mime) = kinds((id % 3).toInt)
      val len = 64 + (Mix64.mix(id) & 0xff).toInt
      val bytes = Array.tabulate(len)(i => Mix64.mix(id * 7919L + i).toByte)
      Asset(s"asset-$id", kind, bytes, mime,
        width = if (kind == "audio") 0 else (64 + (id % 16) * 32).toInt,
        height = if (kind == "audio") 0 else (64 + (id % 9) * 32).toInt,
        duration_ms = if (kind == "image") 0L else 1000L + (Mix64.mix(id + 1) & 0x7fffL))
    }
  }

  /** STUB decode: bytes -> FeatureDim floats. A real build replaces this one
    * function with the codec call (??? semantics made deterministic so the
    * distributed plumbing is testable).
    */
  object StubCodec {
    def decode(bytes: Array[Byte]): Array[Float] = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      Array.tabulate(FeatureDim)(d => (Mix64.mix(h + d) >>> 11).toFloat / (1L << 53).toFloat)
    }
  }

  /** Feature extraction over binary assets: mapPartitions with an explicit
    * batch loop (the shape a vectorized codec needs — amortized per-batch
    * init, bounded memory), preserving partitioning. Output: (asset_id,
    * kind, features array<float>).
    */
  def extractFeatures(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    val batched = assets.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        // per-batch decoder init would go here (codec context, model handle)
        batch.iterator.map(a => (a.asset_id, a.kind, StubCodec.decode(a.bytes)))
      }
    }
    batched.toDF("asset_id", "kind", "features")
  }

  /** Frame sampling plumbing for video assets: derive a frame index list from
    * typed metadata (every `everyMs` ms), intra-row — the downstream decode
    * fans out one row per sampled frame only where kind='video'.
    */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L): DataFrame =
    assets
      .where(col("kind") === "video")
      .withColumn("frame_ts",
        sequence(lit(0L), col("duration_ms"), lit(everyMs)))
      .select(col("asset_id"), posexplode(col("frame_ts")).as(Seq("frame_idx", "ts_ms")))

  /** Media metadata summary per kind (no byte reads: metadata columns only —
    * column pruning keeps the binary payload out of the scan).
    */
  def mediaStats(assets: DataFrame): DataFrame =
    assets.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(length(col("bytes"))).as("total_bytes"),
      avg(col("duration_ms")).as("avg_duration_ms"))
}
