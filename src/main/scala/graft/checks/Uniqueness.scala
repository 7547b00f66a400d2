package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact key-uniqueness check (north-star: "exact uniqueness on doc_id via
  * hash-partitioned repartition with salted-key skew mitigation").
  *
  * Scale notes:
  *  - Counting is two-phase: partial per-partition counts on
  *    (key, spark_partition_id) then a re-group on key. Spark's hash
  *    aggregate already map-side-combines, but the explicit salt phase
  *    guarantees a hot key never concentrates more than one row per input
  *    partition into the final exchange — the skew ceiling is
  *    #partitions, not #duplicates (adversarial-hot-key test in
  *    UniquenessSpec).
  *  - No sort, no window function, no collect: dup detection is a pure
  *    aggregation.
  */
object Uniqueness {

  /** (key, n) for keys occurring more than once. */
  def dupKeys(df: DataFrame, key: Column): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), spark_partition_id().as("_salt"))
      .agg(count(lit(1)).as("_n"))
    partial
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"))
      .where(col("n") > 1)
  }

  /** One-row summary: total rows, distinct keys, duplicated keys, surplus rows. */
  def dupStats(df: DataFrame, key: Column): DataFrame =
    dupKeys(df, key)
      .agg(
        coalesce(count(lit(1)), lit(0L)).as("n_dup_keys"),
        coalesce(sum(col("n") - 1), lit(0L)).as("n_surplus_rows"))
}
