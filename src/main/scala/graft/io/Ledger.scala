package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition lineage + metrics ledger (the north-star resume contract):
  * one row per completed input file per run — files read, rows validated,
  * violations, elapsed ms, completion timestamp. A killed job replays only
  * files absent from the ledger for its (run_id, snapshot_id).
  *
  * Appended once per committed batch, after the batch's outputs are fully
  * written, so a ledger row is proof the batch's work is durable.
  */
object Ledger {

  final case class Row(
      run_id: String,
      snapshot_id: String,
      batch_id: String,
      file: String,
      rows_validated: Long,
      violations: Long,
      docs_failed: Long,
      // wall time of the whole BATCH this file belonged to (files in a
      // batch process in one distributed job; per-file time is not a thing)
      batch_elapsed_ms: Long)

  def path(outDir: String): String = s"$outDir/ledger"

  def append(spark: SparkSession, outDir: String, rows: Seq[Row]): Unit = {
    import spark.implicits._
    rows.toDF()
      .withColumn("completed_at", current_timestamp())
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path(outDir))
  }

  def read(spark: SparkSession, outDir: String): DataFrame = {
    val p = new Path(path(outDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path(outDir))
    else spark.emptyDataset(spark.implicits.newProductEncoder[Row]).toDF()
      .withColumn("completed_at", current_timestamp())
  }

  /** Files already fully processed for (run_id, snapshot_id). */
  def completedFiles(spark: SparkSession, outDir: String, runId: String,
      snapshotId: String): Set[String] =
    read(spark, outDir)
      .where(col("run_id") === runId && col("snapshot_id") === snapshotId)
      .select("file").distinct()
      .collect().map(_.getString(0)).toSet
}
