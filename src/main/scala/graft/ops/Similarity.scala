package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.SketchExprs.cosineSim

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (one scan, no shuffle beyond the final
  * k-row takeOrdered — correct at any scale, O(N·d) work).
  * Scale path: deterministic random-hyperplane LSH bucketing — candidates
  * share a bucket in >=1 band, then exact re-rank. At 100 TB the bucket join
  * replaces the full scan per query batch.
  */
object Similarity {

  /** Per-band hyperplane LSH keys: array of `bands` longs, element b =
    * mixed hash of (band, packed sign bits of `rowsPerBand` hyperplanes).
    * One codegen'd kernel ([[graft.expr.HyperplaneBands]]): plane weights
    * derive from splitmix64(planeSeed, dim) in-loop — deterministic on every
    * executor, no plane table, loud failure on a dimension mismatch. (The
    * previous formulation was an interpreted transform/aggregate lambda
    * tower — bands x rows x dims interpreted closures per row, measured
    * ~minutes for a few hundred 64-dim rows; the kernel is ~16k fused
    * multiply-adds, microseconds.)
    *
    * Bucket-space sizing: each band key has 2^rowsPerBand values, so at
    * 10^12 rows use rowsPerBand >= 16 to keep expected bucket occupancy
    * sub-quadratic; recall is then tuned with `bands`.
    */
  def bandKeys(vec: Column, bands: Int, rowsPerBand: Int, dims: Int): Column =
    graft.expr.SketchExprs.hyperplaneBands(vec, bands, rowsPerBand, dims)

  /** Brute-force top-k by cosine to a literal query vector. */
  def topKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int): DataFrame =
    df.select(id.as("id"), cosineSim(vec, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** LSH-bucketed top-k: prefilter to vectors sharing >=1 band bucket with
    * the query, then exact cosine re-rank. Approximate — recall measured in
    * OpsSpec against the brute-force baseline.
    *
    * Defaults are scale-safe (rowsPerBand=16 -> 65k buckets per band, the
    * sizing the bucket-occupancy note above mandates at corpus scale;
    * bands=32 buys recall back). On toy corpora — thousands of rows, where
    * even moderately-similar vectors must collide to be found — pass a
    * coarser banding explicitly (e.g. bands=8, rowsPerBand=4, as the
    * OpsSpec recall test does on 500 near-orthogonal vectors).
    */
  def annTopKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int, bands: Int = 32, rowsPerBand: Int = 16, dims: Int = 64): DataFrame = {
    val withVec = df.select(id.as("id"), vec.as("v"))
    // band rows carry (id, bh) ONLY — the vector must not ride the x`bands`
    // explode (it did in v1: a x32 copy of every embedding through the band
    // join and a (id, vector) shuffle in the candidate distinct). Same shape
    // as [[Dedup.embeddingCosinePairs]]; asserted by a plan test in OpsSpec.
    val bandRows = withVec.select(col("id"),
      explode(bandKeys(col("v"), bands, rowsPerBand, dims)).as("bh"))
    val qKeys = bandKeys(typedLit(query), bands, rowsPerBand, dims)
    val candIds = bandRows
      .join(broadcast(
        df.sparkSession.range(1).select(explode(qKeys).as("bh"))), Seq("bh"))
      .select(col("id")).distinct() // thin id-only exchange across bands
    // ONE vector fetch per surviving candidate, cosine computed once per id
    candIds.join(withVec, Seq("id"))
      .select(col("id"), cosineSim(col("v"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
