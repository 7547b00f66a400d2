package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff: which ids were added, removed, or
  * changed between two table snapshots — the audit a resumable validation
  * job runs against its previous ledgered snapshot before deciding what to
  * revalidate (only `added`/`changed` rows need the full rule pass).
  */
object SnapshotDiff {

  /** Diff snapshots `a` (old) and `b` (new) by id, with row content
    * compared through `fingerprint` (an expression over the row's columns,
    * resolved against each side — e.g. `xxhash64(col("text"))`; pass a
    * cheap digest, never the full payload).
    *
    * Scale shape: fingerprints are computed map-side, so the full-outer
    * hash join ships (id, 8-byte digest) rows only — never document
    * payloads; `unchanged` rows (the overwhelming majority between
    * adjacent snapshots) are dropped before anything downstream.
    *
    * @return (id, status) with status in {added, removed, changed}
    */
  def diff(a: DataFrame, b: DataFrame, id: Column,
      fingerprint: Column): DataFrame = {
    // presence is an explicit flag — a present row whose fingerprint
    // evaluates to null (e.g. null text) must not read as absent, and the
    // change compare is null-safe so null == null is unchanged
    val old = a.select(id.as("id"), lit(true).as("in_a"), fingerprint.as("fp_a"))
    val neu = b.select(id.as("id"), lit(true).as("in_b"), fingerprint.as("fp_b"))
    old.join(neu, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("in_a").isNull, lit("added"))
          .when(col("in_b").isNull, lit("removed"))
          .when(not(col("fp_a") <=> col("fp_b")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .where(col("status") =!= "unchanged")
  }
}
