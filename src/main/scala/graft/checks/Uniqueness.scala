package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact key-uniqueness check (north-star: "exact uniqueness on doc_id via
  * hash-partitioned repartition with salted-key skew mitigation").
  *
  * Scale notes:
  *  - Counting is two-phase: Catalyst's hash aggregate computes partial
  *    per-partition counts map-side (`partial_count` before the exchange in
  *    the plan), so a hot key ships at most one partial row per input
  *    partition into the exchange — the skew ceiling is #partitions, not
  *    #duplicates (adversarial-hot-key test in ChecksSpec). An earlier
  *    formulation staged this salt EXPLICITLY via a
  *    groupBy(key, spark_partition_id) pre-aggregation; that duplicated
  *    what the partial aggregate already guarantees and cost a second full
  *    exchange of the (key, count) rows — removed (r6 optimization, same
  *    results by construction).
  *  - No sort, no window function, no collect: dup detection is a pure
  *    aggregation.
  */
object Uniqueness {

  /** (key, n) for keys occurring more than once. */
  def dupKeys(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** One-row summary: total rows, distinct keys, duplicated keys, surplus rows. */
  def dupStats(df: DataFrame, key: Column): DataFrame =
    dupKeys(df, key)
      .agg(
        coalesce(count(lit(1)), lit(0L)).as("n_dup_keys"),
        coalesce(sum(col("n") - 1), lit(0L)).as("n_surplus_rows"))
}
