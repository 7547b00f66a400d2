package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event sessionization — the gaps-and-islands operator every event-stream
  * table needs (the `events` table here; in a training-data pipeline the
  * same shape groups per-crawler fetch bursts or per-user interaction
  * traces).
  */
object Sessions {

  /** Per-key session summaries using Spark's native `session_window`
    * (Catalyst's SessionWindow operator merges overlapping [ts, ts+gap]
    * intervals — sessions break only when the next event starts MORE than
    * `gap` after the previous one; an event exactly `gap` later still
    * merges — boundary-inclusive, pinned by spec).
    *
    * Scale shape: session_window aggregates like any keyed aggregation —
    * one shuffle on the key, sessions merged per partition; it never
    * materializes a per-key ordered window frame, so a hyperactive key
    * costs its own rows only. The identical call binds to readStream for
    * continuous sessionization (watermark + session_window is the
    * Structured Streaming idiom).
    *
    * @return (key, session_start, session_end, n_events); session_end is
    *         last event ts + gap (the window's half-open upper bound)
    */
  def sessionSummaries(df: DataFrame, key: Column, ts: Column,
      gap: String = "30 minutes"): DataFrame =
    df.where(ts.isNotNull)
      .groupBy(key.as("key"), session_window(ts, gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
