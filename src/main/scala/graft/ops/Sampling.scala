package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.agg.TopKAgg

/** Corpus-shaping sampling operators for training-data curation: per-group
  * caps (the Common-Crawl-style "at most K documents per domain" rule) and
  * stratified deterministic sampling (per-language / per-source rates).
  * Both are reproducible pure functions of the data — rerunning on a
  * different cluster, partitioning, or day yields the same subset.
  */
object Sampling {

  /** Cap each group at its `k` smallest-id members ("first K docs per
    * domain" under deterministic doc_id order). Returns (g, id) kept rows.
    *
    * Scale shape: a bounded [[graft.agg.TopKAgg]] heap per group — O(k)
    * state that combines map-side, so a million-document hot domain ships
    * at most k rows per task into the group shuffle. The window-function
    * formulation (`row_number() over (partition by g order by id)`) would
    * instead sort the hot domain's every row in one task — the exact skew
    * this operator exists to absorb.
    */
  def capPerGroup(df: DataFrame, group: Column, id: Column, k: Int): DataFrame = {
    require(k > 0, s"cap k must be positive: $k")
    // TopKAgg keeps the k LARGEST scores; score = -id keeps the k smallest
    // ids (exact for |id| < 2^53)
    df.select(group.as("g"), id.cast("long").as("id"))
      .groupBy(col("g"))
      .agg(TopKAgg.topK(negate(col("id").cast("double")), col("id"), k).as("kept"))
      .select(col("g"), explode(col("kept")).as("e"))
      .select(col("g"), col("e.id").as("id"))
  }

  /** Stratified deterministic hash sampling: each stratum keeps its own
    * rate (fraction in [0,1]), unlisted strata fall back to `defaultRate`.
    * The keep decision reuses [[TextAnalysis.sampleByHash]]'s key function
    * (FNV-1a of key+salt, mod 1e6) so per-stratum subsets NEST across rates
    * exactly like the flat sampler — raising one stratum's rate only ADDS
    * documents, and a stratified sample at rate r is a subset of the flat
    * sample at rate >= r under the same salt.
    *
    * Scale shape: map-only (a codegen'd hash + a broadcast-literal map
    * lookup per row); no shuffle, partitioning-independent.
    */
  def stratifiedSampleByHash(df: DataFrame, key: Column, strata: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0,1]"))
    val thresholds = rates.map { case (s, r) => s -> math.round(r * 1000000L) }
    val cut = coalesce(
      element_at(typedLit(thresholds), strata.cast("string")),
      lit(math.round(defaultRate * 1000000L)))
    df.where(pmod(
      graft.expr.SketchExprs.fnv64(concat(key.cast("string"), lit(salt))),
      lit(1000000L)) < cut)
  }
}
