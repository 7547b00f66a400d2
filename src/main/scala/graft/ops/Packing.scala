package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining-batch assembly: lay documents head to
  * tail in a deterministic order and split the token stream every
  * `capacity` tokens (GPT-style concat-then-chunk packing — documents may
  * straddle a chunk boundary). The output maps each document to the chunk
  * range it occupies, which is what a downstream batch writer needs to
  * materialize fixed-length training sequences.
  */
object Packing {

  /** Assign each document its packed-chunk coordinates.
    *
    * Documents are first routed to `buckets` independent streams by an
    * FNV-1a hash of their id (the hash is the oracle-replayable
    * [[graft.expr.SketchExprs.fnv64]]); within a bucket the stream order is
    * ascending id. Chunking is then pure prefix-sum arithmetic: with
    * `cum` = tokens before this doc in its bucket, the doc occupies chunks
    * `floor(cum / capacity) .. floor((cum + n - 1) / capacity)` starting at
    * offset `cum % capacity`.
    *
    * Scale shape: one shuffle on (bucket) + a per-bucket sort — packing is
    * embarrassingly parallel across buckets, and `buckets` is the
    * parallelism knob (size it so a bucket's rows fit a task's sort
    * budget; the window never concentrates more than one bucket on a
    * task). All arithmetic is exact for corpora under 2^53 tokens per
    * bucket. Zero-token docs occupy zero chunks but are still reported at
    * their boundary (chunk_last = chunk_first, width 0 by `n_tokens`).
    *
    * @return (id, n_tokens, bucket, chunk_first, chunk_last, chunk_offset)
    */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
      capacity: Long, buckets: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id.cast("long").as("id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket",
        pmod(graft.expr.SketchExprs.fnv64(col("id").cast("string")),
          lit(buckets.toLong)))
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id"), col("n_tokens"), col("bucket"),
        floor(col("cum") / lit(capacity)).cast("long").as("chunk_first"),
        floor(greatest(col("cum"),
          col("cum") + col("n_tokens") - 1) / lit(capacity)).cast("long")
          .as("chunk_last"),
        pmod(col("cum"), lit(capacity)).as("chunk_offset"))
  }
}
