package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift statistics against a baseline snapshot (north-star:
  * "KS/PSI distribution-drift tests on span-offset and kind-frequency
  * histograms"). Both reduce to small-cardinality aggregations (≤ a few
  * hundred rows after groupBy), so the heavy work is one distributed
  * aggregate per side; the final statistic is computed with a tiny
  * full-outer join + reduce — no driver-side math on big data.
  */
object Drift {

  private val Epsilon = 1e-6 // PSI guard for empty cells (standard practice)

  /** Population Stability Index between two categorical distributions:
    * PSI = Σ (p−q) · ln(p/q) over category frequencies. Returns one row
    * (psi: double).
    */
  def psi(current: DataFrame, baseline: DataFrame, category: Column): DataFrame = {
    val cur = current.groupBy(category.as("cat")).agg(count(lit(1)).as("n_cur"))
    val base = baseline.groupBy(category.as("cat")).agg(count(lit(1)).as("n_base"))
    cur.join(base, Seq("cat"), "full_outer")
      .na.fill(0L, Seq("n_cur", "n_base"))
      .select(
        (col("n_cur") / sum(col("n_cur")).over()).as("p"),
        (col("n_base") / sum(col("n_base")).over()).as("q"))
      .select(greatest(col("p"), lit(Epsilon)).as("p"),
        greatest(col("q"), lit(Epsilon)).as("q"))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }

  /** Kolmogorov–Smirnov statistic between two numeric distributions via a
    * fixed bucketing: KS = max |CDF_cur − CDF_base| over bucket edges.
    * Exact for discrete/bucketed data; an upper-bounded approximation
    * (±1/buckets) for continuous data — the scale-path tradeoff chosen by
    * SURVEY.md §2 Part B (aggregate histograms, never sort 10^12 rows).
    */
  def ksBucketed(current: DataFrame, baseline: DataFrame, value: Column,
      lo: Double, hi: Double, buckets: Int = 256): DataFrame = {
    def hist(df: DataFrame, cName: String): DataFrame = {
      val b = least(greatest(
        floor((value - lit(lo)) / lit((hi - lo) / buckets)), lit(0L)),
        lit(buckets.toLong - 1)).as("bucket")
      df.where(value.isNotNull).groupBy(b).agg(count(lit(1)).as(cName))
    }
    val joined = hist(current, "n_cur").join(hist(baseline, "n_base"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_cur", "n_base"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    joined
      .select(
        (sum(col("n_cur")).over(w) / sum(col("n_cur")).over()).as("cdf_cur"),
        (sum(col("n_base")).over(w) / sum(col("n_base")).over()).as("cdf_base"))
      .agg(max(abs(col("cdf_cur") - col("cdf_base"))).as("ks"))
  }

  /** Auto-ranged [[ksBucketed]]: pass 1 computes the combined [min, max] of
    * both sides (one tiny map-side-combined aggregate over the union — a
    * (double, double) row per partition), pass 2 buckets on exactly that
    * range. A 100 TB corpus with an unknown value range cannot silently
    * clip into [[ksBucketed]]'s clamp buckets — with a fixed guess, every
    * out-of-range value collapses into bucket 0 or buckets-1 and the
    * statistic quietly understates (or misplaces) tail drift. Costs one
    * extra scan of the value column; at extreme scale substitute a sketch
    * range (e.g. a t-digest's [q0, q100]) and call [[ksBucketed]] directly.
    *
    * Degenerate inputs: no non-null values on either side -> ks = null;
    * a single distinct value -> both CDFs are a step at the same bucket ->
    * ks = 0 (the range is widened by 1 to keep the bucket width positive).
    */
  def ksAuto(current: DataFrame, baseline: DataFrame, value: Column,
      buckets: Int = 256): DataFrame = {
    val r = current.select(value.cast("double").as("v"))
      .unionByName(baseline.select(value.cast("double").as("v")))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().head
    if (r.isNullAt(0))
      current.sparkSession.sql("SELECT CAST(NULL AS DOUBLE) AS ks")
    else {
      val lo = r.getDouble(0)
      val hi = if (r.getDouble(1) > lo) r.getDouble(1) else lo + 1.0
      ksBucketed(current, baseline, value, lo, hi, buckets)
    }
  }

  /** Kind-frequency histogram of a docs table: (kind, freq) rows, the input
    * to a PSI/KS drift check against a baseline snapshot. The explode feeds
    * a partial hash aggregate in the SAME stage (map-side combine), so the
    * per-span rows never cross the network — the only shuffle is the tiny
    * (kind, partial-count) aggregation, a handful of rows per partition.
    * Column pruning keeps every other span field (text, media_ref) out of
    * the scan: only `spans.kind` is read.
    */
  def kindFrequencies(docs: DataFrame): DataFrame =
    docs
      .select(explode(col("spans.kind")).as("kind"))
      .groupBy(col("kind")).agg(count(lit(1)).as("freq"))

  /** Per-group PSI of observed (group, cat, n) counts against one baseline
    * (cat, n_base) histogram — the drift statistic per event-time window
    * (feed [[graft.streaming.StreamingValidation.kindFrequencyStream]]'s
    * closed windows in as `grouped`), per source shard, per day, etc.
    *
    * The baseline is tiny (category cardinality) and rides a broadcast
    * join; categories present in the baseline but absent from a group
    * still contribute (a vanished category IS drift), via a per-group
    * fill-in of the full baseline category set. One shuffle on (group).
    *
    * @param grouped  observed counts; `group`/`category`/`n` name its columns
    * @param baseline histogram with columns named `cat` and `n_base`
    *                 (e.g. `kindFrequencies(...).select($"kind".as("cat"),
    *                 $"freq".as("n_base"))`)
    */
  def psiGrouped(grouped: DataFrame, baseline: DataFrame,
      group: Column, category: Column, n: Column): DataFrame = {
    // defensive pre-aggregation: the contract says pre-aggregated counts,
    // but a duplicated (group, cat) row would otherwise fan out through the
    // frame join and silently double-count its PSI term — summing here is
    // the same shuffle the frame join needs anyway
    val cur = grouped.select(group.as("g"), category.as("cat"), n.as("n_cur"))
      .groupBy(col("g"), col("cat")).agg(sum(col("n_cur")).as("n_cur"))
    val base = baseline.groupBy(col("cat")).agg(sum(col("n_base")).as("n_base"))
    // per-group FULL category frame (the grouped analog of psi's full-outer
    // join): the group's own categories union the baseline's, so both a
    // vanished category (in baseline, absent from the window) and a novel
    // one (in the window, absent from baseline) register as drift
    val frame = cur.select(col("g"), col("cat"))
      .unionByName(cur.select(col("g")).distinct()
        .crossJoin(broadcast(base.select(col("cat")))))
      .distinct()
    frame.join(cur, Seq("g", "cat"), "left_outer")
      .join(broadcast(base), Seq("cat"), "left_outer")
      .na.fill(0L, Seq("n_cur", "n_base"))
      .select(col("g"), col("n_cur"), col("n_base"))
      .withColumn("p", greatest(
        col("n_cur") / sum(col("n_cur")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))),
        lit(Epsilon)))
      .withColumn("q", greatest(
        col("n_base") / sum(col("n_base")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))),
        lit(Epsilon)))
      .groupBy(col("g"))
      .agg(sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }
}
