package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{MarcErrors, MarcValidator}
import graft.gen.Fixtures
import graft.rules.RuleSet
import graft.schema.Span

/** Standalone single-field validation (reference tests/test_fields.py loc
  * conventions) and the per-record error renderers (README.md:96-176).
  */
class FieldErrorsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val rules = RuleSet.default

  // ---- standalone field locs (tests/test_fields.py) -----------------------

  test("standalone control field: ('data', tag) locs like test_fields.py:108,201") {
    val vs = MarcValidator.validateField(Span("006", "p|||||", null, 0), rules)
    assert(vs.length == 1)
    assert(vs.head.rule_id == "control_field_length_invalid")
    assert(vs.head.loc == Seq("data", "006"))
    val vs8 = MarcValidator.validateField(
      Span("008", "210505s2021    nyu", null, 0), rules)
    assert(vs8.head.loc == Seq("data", "008"))
    // null data -> string_type at ('data',) (test_fields.py:90-91)
    val vsNull = MarcValidator.validateField(Span("008", null, null, 0), rules)
    assert(vsNull.head.rule_id == "string_type" && vsNull.head.loc == Seq("data"))
  }

  test("standalone data field: indicator and subfield locs") {
    val vs = MarcValidator.validateField(Span("010", "11$a1$c2", null, 0), rules)
    val locs = vs.map(_.loc)
    // ('indicators', tag, ind) for domains; ('subfields', tag, code) for
    // codes (test_fields.py:345,455,569)
    assert(locs.contains(Seq("indicators", "010", "ind1")))
    assert(locs.contains(Seq("indicators", "010", "ind2")))
    assert(locs.contains(Seq("subfields", "010", "c")))
    // clean standalone field -> no violations
    assert(MarcValidator.validateField(
      Span("010", "  $a2024111111$z2020111111", null, 0), rules).isEmpty)
    // malformed tag -> ('tag',)
    val bad = MarcValidator.validateField(Span("01a", "  $aV", null, 0), rules)
    assert(bad.head.loc == Seq("tag"))
  }

  test("standalone leader mirrors PydanticLeader (test_fields.py:618-632)") {
    assert(MarcValidator.validateLeader("00215cam a22000975i 4500", rules).isEmpty)
    val vs = MarcValidator.validateLeader("01632cam a2200529       ", rules)
    assert(vs.length == 1)
    assert(vs.head.rule_id == "string_pattern_mismatch")
    assert(vs.head.loc == Seq("leader"))
  }

  // ---- error renderers ----------------------------------------------------

  test("human rendering matches pydantic str(e) byte format") {
    val vs = MarcValidator.validate(Seq(
      Span("LDR", "00454cam a22001575i 4500", null, 0),
      Span("001", "on1", null, 1),
      Span("001", "on1", null, 2),
      Span("008", "190306s2017    ht a   j      000 1 hat d", null, 3),
      Span("245", "00$aT", null, 4)), rules)
    assert(MarcErrors.human(vs) ==
      """1 validation error for MarcRecord
        |fields.001
        |  001: Has been marked as a non-repeating field. [type=non_repeatable_field, input_value='001', input_type=str]""".stripMargin)
  }

  test("human rendering of the invalid fixture (README.md:147-176 format)") {
    val vs = MarcValidator.validate(Fixtures.invalidDoc.spans, rules)
    val text = MarcErrors.human(vs)
    assert(text.startsWith("9 validation errors for MarcRecord"))
    assert(text.contains(
      "fields.100.110\n  1XX: Only one 1XX tag is allowed. Record contains: " +
        "['100', '110'] [type=multiple_1xx_fields, input_value=['100', '110'], " +
        "input_type=list]"))
    // the 600 $a repeat: subfield model list repr with pydantic-core's
    // >50-char truncation (first 25 + '...' + last 24) — README.md:175
    assert(text.contains(
      "fields.600.a\n  600 $a: Subfield cannot repeat. " +
        "[type=non_repeatable_subfield, " +
        "input_value=[PydanticSubfield(code='a...'a', value='Foo, Bar,')], " +
        "input_type=list]"))
  }

  test("json rendering: compact pydantic ErrorDetails key order") {
    val vs = MarcValidator.validate(Seq(
      Span("LDR", "00454cam a22001575i 4500", null, 0),
      Span("001", "x", null, 1),
      Span("001", "x", null, 2),
      Span("008", "190306s2017    ht a   j      000 1 hat d", null, 3),
      Span("245", "00$aT", null, 4)), rules)
    assert(MarcErrors.json(vs) ==
      """[{"type":"non_repeatable_field","loc":["fields","001"],""" +
        """"msg":"001: Has been marked as a non-repeating field.",""" +
        """"input":"001","ctx":{"input":"001"}}]""")
  }

  test("json rendering via the Spark column over the violations array") {
    import spark.implicits._
    val df = Seq(Fixtures.invalidDoc).toDF()
    val out = graft.checks.RowValidator.withViolations(df)
      .select(MarcErrors.jsonColumn($"violations").as("ej"))
      .as[String].collect().head
    assert(out == MarcErrors.json(MarcValidator.validate(Fixtures.invalidDoc.spans, rules)))
    assert(out.contains("\"loc\":[\"fields\",\"100\",\"110\"]"))
    assert(out.contains("\"input\":[\"100\",\"110\"]"))
  }
}
