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
    * xxhash64(b, packed sign bits of `rowsPerBand` hyperplanes).
    *
    * The hyperplane weights are derived in-plan from xxhash64(planeIdx, dim)
    * scaled to [-1, 1) — deterministic everywhere, any dimensionality, and
    * ONE expression regardless of bands*rowsPerBand (the per-bit typedLit
    * plane encoding used previously grew the plan linearly in bit count and
    * silently corrupted signatures when the vector dimension differed from
    * the hardcoded plane length; this version fails loudly via assert_true
    * on a dimension mismatch).
    *
    * Bucket-space sizing: each band key has 2^rowsPerBand values, so at
    * 10^12 rows use rowsPerBand >= 16 to keep expected bucket occupancy
    * sub-quadratic; recall is then tuned with `bands`.
    */
  def bandKeys(vec: Column, bands: Int, rowsPerBand: Int, dims: Int): Column = {
    require(bands > 0 && rowsPerBand > 0 && rowsPerBand <= 62 && dims > 0)
    // null on success, throws on mismatch; coalesced to 0.0 and added to the
    // first dot product so the check rides inside the single expression
    val guard = coalesce(
      assert_true(size(vec) === lit(dims),
        concat(lit(s"bandKeys: expected $dims-dim vector, got size "),
          size(vec).cast("string"))).cast("double"),
      lit(0.0))
    def weight(p: Column, d: Column): Column =
      xxhash64(p, d).cast("double") / lit(9.223372036854776e18)
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b,
        aggregate(sequence(lit(0), lit(rowsPerBand - 1)), lit(0L), (acc, r) => {
          val p = b * lit(rowsPerBand) + r
          val dot = aggregate(sequence(lit(0), lit(dims - 1)), guard, (a2, d) =>
            a2 + element_at(vec, d + 1).cast("double") * weight(p, d))
          acc * lit(2L) + when(dot >= 0, lit(1L)).otherwise(lit(0L))
        })))
  }

  /** Brute-force top-k by cosine to a literal query vector. */
  def topKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int): DataFrame =
    df.select(id.as("id"), cosineSim(vec, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** LSH-bucketed top-k: prefilter to vectors sharing >=1 band bucket with
    * the query, then exact cosine re-rank. Approximate — recall measured in
    * OpsSpec against the brute-force baseline.
    */
  def annTopKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int, bands: Int = 4, rowsPerBand: Int = 4, dims: Int = 64): DataFrame = {
    val keys = bandKeys(vec, bands, rowsPerBand, dims)
    val data = df.select(id.as("id"), vec.as("v"), explode(keys).as("bh"))
    val qKeys = bandKeys(typedLit(query), bands, rowsPerBand, dims)
    data
      .join(broadcast(
        df.sparkSession.range(1).select(explode(qKeys).as("bh"))), Seq("bh"))
      .select(col("id"), col("v")).distinct()
      .select(col("id"), cosineSim(col("v"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
