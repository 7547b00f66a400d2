package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.RowValidator
import graft.gen.{Fixtures, Synth}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` key has a matching `oracleSql` entry (DuckDB-runnable over
  * the same parquet tables) unless the operator is not SQL-expressible, in
  * which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship: full MARC validation pass over a deterministic synthetic
    * interleaved corpus + the two golden fixture docs. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val docs = Synth.corpusDF(spark, 1000)
      .union(Seq(Fixtures.validDoc, Fixtures.invalidDoc).toDF())
    RowValidator.verdicts(docs)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-A12: full rule surface over the golden fixtures; oracle is the
    // expected-violation VALUES literal (the reference's own expectations,
    // /root/reference/tests/test_models.py:120-152).
    "marc_fixture_violations" -> ((s, _) => {
      import s.implicits._
      val docs = Seq(Fixtures.validDoc, Fixtures.invalidDoc).toDF()
      RowValidator.violations(docs)
        .select($"doc_id", $"rule_id", array_join($"loc", "/").as("loc_path"), $"msg")
    }),
    // Rule surface over a 500-doc synthetic corpus keyed by the driver's
    // documents.doc_id; per-rule violation counts are closed-form in doc_id.
    "marc_corpus_verdicts" -> ((s, dir) => {
      import s.implicits._
      val ids = s.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id".cast("long")).as[java.lang.Long]
      val docs = Synth.corpusFromIds(ids).toDF()
      RowValidator.violations(docs)
        .groupBy($"rule_id").agg(count(lit(1)).as("n"))
    }),
    "marc_corpus_passed" -> ((s, dir) => {
      import s.implicits._
      val ids = s.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id".cast("long")).as[java.lang.Long]
      val docs = Synth.corpusFromIds(ids).toDF()
      RowValidator.verdicts(docs)
        .agg(
          count(when($"passed", 1)).as("n_passed"),
          count(when(!$"passed", 1)).as("n_failed"),
          count(lit(1)).as("n_docs"))
    }))

  /** DuckDB-equivalent SQL per query (same column names — the driver's
    * compare sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = {
    val fixtureRows = Fixtures.expectedInvalid
      .map { case (rid, loc, msg) =>
        val esc = msg.replace("'", "''")
        s"('1234567890', '$rid', '${loc.replace("'", "''")}', '$esc')"
      }
      .mkString(", ")
    Map(
      "marc_fixture_violations" ->
        s"SELECT * FROM (VALUES $fixtureRows) AS t(doc_id, rule_id, loc_path, msg)",
      "marc_corpus_verdicts" -> """
        SELECT 'non_repeatable_field' AS rule_id, count(*) AS n FROM documents WHERE doc_id % 9 = 1
        UNION ALL SELECT 'missing_required_field', count(*) FROM documents WHERE doc_id % 9 = 2
        UNION ALL SELECT 'multiple_1xx_fields', count(*) FROM documents WHERE doc_id % 9 = 3
        UNION ALL SELECT 'control_field_length_invalid', count(*) FROM documents WHERE doc_id % 9 = 4
        UNION ALL SELECT 'invalid_indicator', 2 * count(*) FROM documents WHERE doc_id % 9 = 5
        UNION ALL SELECT 'subfield_not_allowed', count(*) FROM documents WHERE doc_id % 9 = 6
        UNION ALL SELECT 'non_repeatable_subfield', count(*) FROM documents WHERE doc_id % 9 = 7
        UNION ALL SELECT 'string_pattern_mismatch', count(*) FROM documents WHERE doc_id % 9 = 8
      """.trim,
      "marc_corpus_passed" -> ("SELECT count(*) FILTER (WHERE doc_id % 9 = 0) AS n_passed, "
        + "count(*) FILTER (WHERE doc_id % 9 <> 0) AS n_failed, count(*) AS n_docs FROM documents"))
  }
}
