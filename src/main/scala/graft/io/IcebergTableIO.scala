package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The production [[TableIO]]: Iceberg snapshot pinning through Spark's
  * string-based DataSource API — `format("iceberg")` resolves the connector
  * at RUNTIME from the session catalog, so this class compiles with no
  * Iceberg jar on the compile classpath (this sandbox ships none) and runs
  * anywhere `iceberg-spark-runtime` is deployed alongside Spark.
  *
  * Contract mapping vs the parquet emulation ([[ParquetSnapshotIO]]):
  *   - pin      = read the table's current snapshot id from its `.snapshots`
  *                metadata table (newest committed snapshot)
  *   - re-read  = `option("snapshot-id", ...)` time travel — Iceberg
  *                guarantees the same data files for the same snapshot, the
  *                property the emulation reproduces with its manifest
  *   - files    = the snapshot's data-file list from the `.files` metadata
  *                table (drives the ledger's per-file lineage exactly like
  *                the emulation's directory listing)
  *
  * `inputDir` is the Iceberg table identifier (e.g. `catalog.db.docs`), not
  * a filesystem path; `manifestDir` is unused — Iceberg's own metadata IS
  * the manifest.
  *
  * Runtime-proof status (attempted 2026-08-17): `iceberg-spark-runtime` is
  * not resolvable in this sandbox — no Iceberg jar under /opt/spark/jars or
  * the coursier cache (118 cached jars inventoried, all sbt/scalatest
  * infrastructure), COURSIER_MODE=offline, and direct egress to Maven
  * Central fails at DNS (curl rc=6, host unreachable). An integration test
  * against a local warehouse therefore cannot run here; the contract is
  * exercised through [[ParquetSnapshotIO]] (ResumeSpec: pin, replay,
  * mid-batch kill), which implements the same three-method surface this
  * class maps onto Iceberg metadata tables.
  */
object IcebergTableIO extends TableIO {

  override def pinSnapshot(spark: SparkSession, table: String,
      manifestDir: String): Snapshot = {
    val snapId = spark.read.format("iceberg").load(s"$table.snapshots")
      .orderBy(org.apache.spark.sql.functions.col("committed_at").desc)
      .select("snapshot_id").limit(1)
      .collect().headOption
      .map(_.getLong(0).toString)
      .getOrElse(throw new IllegalStateException(s"iceberg table $table has no snapshots"))
    val files = spark.read.format("iceberg")
      .option("snapshot-id", snapId)
      .load(s"$table.files")
      .select("file_path")
      .collect().map(_.getString(0)).sorted.toVector
    Snapshot(snapId, table, files)
  }

  override def readSnapshot(spark: SparkSession, snapshot: Snapshot,
      files: Seq[String]): DataFrame = {
    val pinned = spark.read.format("iceberg")
      .option("snapshot-id", snapshot.snapshotId)
      .load(snapshot.inputDir)
    // resume path: restrict to the still-unfinished data files of the pinned
    // snapshot via the file-level lineage column (pushed to the scan; see
    // Iceberg's _file metadata column)
    if (files.size == snapshot.files.size) pinned
    else pinned.where(org.apache.spark.sql.functions.col("_file").isin(files: _*))
  }
}
