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

  /** The ONE keep-function every deterministic sampler shares (flat
    * [[TextAnalysis.sampleByHash]], stratified, and their SQL oracles):
    * FNV-1a of key+salt into a slot in [0, 1e6). The nesting guarantees —
    * raising a rate only ADDS rows, a stratified sample nests inside the
    * flat sample at an equal-or-higher rate, same salt — hold exactly
    * because both samplers compare the SAME slot against their thresholds;
    * duplicating this expression would let them silently drift apart.
    */
  private[ops] def hashSlot(key: Column, salt: String): Column =
    pmod(graft.expr.SketchExprs.fnv64(concat(key.cast("string"), lit(salt))),
      lit(1000000L))

  /** Rate in [0,1] -> slot threshold (keep iff slot < threshold). */
  private[ops] def slotThreshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    math.round(rate * 1000000L)
  }

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
    val thresholds = rates.map { case (s, r) => s -> slotThreshold(r) }
    val cut = coalesce(
      element_at(typedLit(thresholds), strata.cast("string")),
      lit(slotThreshold(defaultRate)))
    df.where(hashSlot(key, salt) < cut)
  }
}
