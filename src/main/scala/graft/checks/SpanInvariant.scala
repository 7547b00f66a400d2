package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-row span-sequence invariant as a first-class check (north rule /
  * input_hint: span-sequence equality over (kind, text, media_ref, order)):
  *
  *   - ORDER: `spans[i].offset == i` for every i — offsets are the 0-based
  *     span positions, so array order IS document order and any
  *     reorder/drop/splice shows up as a mismatch;
  *   - MEDIA: `media_ref` is present exactly on `kind = "media"` spans
  *     (non-null there, null elsewhere).
  *
  * Both are pure higher-order array functions over the spans
  * array<struct> — one fused projection per row, NO explode (the
  * north-star constraint; pinned by a plan test in SpanInvariantSpec),
  * embarrassingly parallel at 10^12 rows.
  */
object SpanInvariant {

  /** True iff every span's offset equals its array position. Empty span
    * arrays are vacuously ordered.
    */
  def orderOk(spans: Column): Column =
    when(size(spans) === 0, lit(true)).otherwise(
      forall(zip_with(spans.getField("offset"),
          sequence(lit(0), size(spans) - 1), (o, i) => o === i),
        ok => ok))

  /** True iff media_ref presence matches kind == "media" on every span. */
  def mediaRefOk(spans: Column): Column =
    forall(spans, s =>
      (s.getField("kind") === "media") === s.getField("media_ref").isNotNull)

  /** docs + span_order_ok + media_ref_ok (one row per doc, no fan-out). */
  def check(docs: DataFrame, spans: Column = col("spans")): DataFrame =
    docs
      .withColumn("span_order_ok", orderOk(spans))
      .withColumn("media_ref_ok", mediaRefOk(spans))
}
