package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.RowValidator
import graft.expr.MarcValidator
import graft.gen.Fixtures
import graft.rules.{RuleJson, RuleSet}

/** Three-scope rule overrides, mirroring the reference's check_marc_rules
  * precedence (validators.py:27-72; asserted tests/test_validators.py:24-109):
  * per-field rules win over context rules, which win over the record table —
  * while record-LEVEL checks (required/non-repeatable/1XX) always use the
  * record scope (validators.py:221-239).
  */
class OverrideSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val base = RuleSet.default
  private def invalidViolations = MarcValidator.validate(Fixtures.invalidDoc.spans, base)

  test("RuleJson parses the reference rule-dict shape") {
    val rs = RuleJson.parse(
      """{"001": {},
         "006": {"repeatable": true, "length": 18},
         "007": {"length": {"a": 8, "c": [6, 14]}},
         "245": {"repeatable": false, "ind1": ["0", "1"],
                 "subfields": {"valid": ["a", "b"], "non_repeatable": ["a"]},
                 "required": true}}""")
    assert(rs.get("001").get == graft.rules.TagRule(true, None, None, None, None, false))
    assert(rs.get("006").get.length.get == RuleSet.FixedLen(RuleSet.LenSpec(Seq(18), "18")))
    assert(rs.get("007").get.length.get == RuleSet.MaterialLen(Map(
      "a" -> RuleSet.LenSpec(Seq(8), "8"), "c" -> RuleSet.LenSpec(Seq(6, 14), "[6, 14]"))))
    val r245 = rs.get("245").get
    assert(!r245.repeatable && r245.required && r245.ind1.get == Seq("0", "1"))
    assert(r245.subfields.get == RuleSet.Sf("ab", "", "a"))
    assert(rs.requiredTags == Vector("245"))
  }

  test("context scope overrides field checks but not record-level checks") {
    // context drops the 006 length rule -> control_field_length_invalid gone;
    // record-level violations (dup 001, missing 245, 1XX) must remain
    val ctx = base.withOverrides(Map("006" -> Some(
      base.get("006").get.copy(length = None))))
    val vs = MarcValidator.validate(Fixtures.invalidDoc.spans, base, ctx, _ => None)
    assert(!vs.exists(_.rule_id == "control_field_length_invalid"))
    assert(vs.exists(_.rule_id == "non_repeatable_field"))
    assert(vs.exists(_.rule_id == "missing_required_field"))
    assert(vs.length == invalidViolations.length - 1)
    // an EMPTY context table silences every field check but record checks stay
    val vs2 = MarcValidator.validate(Fixtures.invalidDoc.spans, base,
      RuleSet(Vector.empty), _ => None)
    assert(vs2.map(_.rule_id).toSet ==
      Set("string_pattern_mismatch", "non_repeatable_field",
        "missing_required_field", "multiple_1xx_fields"))
  }

  test("per-span scope wins over context (reference: field rules are kept)") {
    val ctx = RuleSet(Vector.empty) // context: no field checks anywhere
    // span 3 is the bad 006; give it back the real rules per-span
    val perSpan: Int => Option[RuleSet] =
      i => if (i == 3) Some(base) else None
    val vs = MarcValidator.validate(Fixtures.invalidDoc.spans, base, ctx, perSpan)
    assert(vs.exists(_.rule_id == "control_field_length_invalid")) // 006 re-armed
    assert(!vs.exists(_.rule_id == "invalid_indicator")) // 336 still silenced
  }

  test("data-driven scopes through the Spark expression") {
    val docs = Seq(Fixtures.invalidDoc).toDF()
    // record-scope JSON: only 001 exists and has no checks -> field checks
    // and required/non-repeatable record checks all resolve against it
    val recordJson = """{"001": {}}"""
    val out = RowValidator.withViolations(
      docs.withColumn("rr", lit(recordJson)),
      recordRules = Some(col("rr")))
    val vs = out.select(explode(col("violations.rule_id"))).as[String].collect().toSeq
    // leader check is schema-level (not rule-table-driven); 1XX stays on
    assert(vs.sorted == Seq("multiple_1xx_fields", "string_pattern_mismatch"))

    // per-span JSON on the 336 span (index 8): silence its checks
    val spanJsons = Fixtures.invalidDoc.spans.indices.map {
      case 8 => """{"336": {}}"""
      case _ => null.asInstanceOf[String]
    }
    val out2 = RowValidator.withViolations(
      docs.withColumn("sr", typedlit(spanJsons)),
      spanRules = Some(col("sr")))
    val vs2 = out2.select(explode(col("violations.rule_id"))).as[String].collect().toSeq
    assert(!vs2.contains("invalid_indicator") && !vs2.contains("subfield_not_allowed"))
    assert(vs2.contains("non_repeatable_subfield")) // 600 span untouched
    assert(vs2.length == invalidViolations.length - 3)
  }

  test("override-free rows keep the fast path (same results either way)") {
    val docs = Seq(Fixtures.validDoc, Fixtures.invalidDoc).toDF()
      .withColumn("rr", lit(null).cast("string"))
    val plain = RowValidator.verdicts(docs.select("doc_id", "spans"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    val overrideForm = RowValidator.withViolations(docs, recordRules = Some(col("rr")))
      .select(col("doc_id"), col("passed"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(plain == overrideForm)
    assert(plain("on1381158740") && !plain("1234567890"))
  }
}
