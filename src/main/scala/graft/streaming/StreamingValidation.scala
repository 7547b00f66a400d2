package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.checks.RowValidator
import graft.rules.RuleSet

/** Structured-Streaming form of the engine. The batch core is a pure
  * DataFrame -> DataFrame function, so the streaming variant is the same
  * plan bound to a streaming source (SURVEY.md §2 Part B "Streaming"):
  * `readStream.parquet(docsDir) |> validate |> writeStream`.
  */
object StreamingValidation {

  /** Per-doc verdicts on a streaming docs frame (stateless: one row in, one
    * row out — safe in append mode with no watermark).
    */
  def verdictStream(docs: DataFrame, rules: RuleSet = RuleSet.default): DataFrame =
    RowValidator.verdicts(docs, rules)

  /** Violation rows on a streaming docs frame. */
  def violationStream(docs: DataFrame, rules: RuleSet = RuleSet.default): DataFrame =
    RowValidator.withViolations(docs, rules)
      .where(not(col("passed")))
      .select(col("doc_id"), explode(col("violations")).as("v"))
      .select(col("doc_id"), col("v.*"))

  /** Windowed violation-rate over an event-time column: watermarked tumbling
    * windows, late data dropped past the watermark (stateful aggregation).
    */
  def windowedViolationRate(docs: DataFrame, tsCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours",
      rules: RuleSet = RuleSet.default): DataFrame =
    RowValidator.withViolations(docs, rules) // stateless; keeps the ts column
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("passed"))
      .agg(count(lit(1)).as("n"))
}
