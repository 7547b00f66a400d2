package graft.gen

import graft.schema.{Doc, Span}

/** The two golden records from the reference's test suite, span-encoded per
  * FIXTURES.md §§3-4 (sources: /root/reference/tests/conftest.py:6-58 valid,
  * :61-133 invalid; expected errors /root/reference/tests/test_models.py:120-152).
  */
object Fixtures {

  /** stub_record: passes with zero violations. Includes an engine-added media
    * span (ignored by MARC checks) and unknown tag 910 (all checks skip).
    */
  val validDoc: Doc = Doc("on1381158740", Seq(
    Span("LDR", "00454cam a22001575i 4500", null, 0),
    Span("001", "on1381158740", null, 1),
    Span("008", "190306s2017    ht a   j      000 1 hat d", null, 2),
    Span("050", " 4$aF00", null, 3),
    Span("245", "00$aTitle :$bsubtitle /$cAuthor", null, 4),
    Span("300", "  $a100 pages :", null, 5),
    Span("media", "", "asset-0001", 6),
    Span("910", "  $aRL", null, 7)))

  /** stub_invalid_record: exactly 9 violations (FIXTURES.md §4). */
  val invalidDoc: Doc = Doc("1234567890", Seq(
    Span("LDR", "01632cam a2200529       ", null, 0),
    Span("001", "1234567890", null, 1),
    Span("001", "1234567890", null, 2),
    Span("006", "p|||||", null, 3),
    Span("008", "240911s2023    lv a     bc   000 0dlat d", null, 4),
    Span("100", "1 $aFoo$eauthor", null, 5),
    Span("110", "1 $aBar$epublisher", null, 6),
    Span("300", "  $a100 pages :", null, 7),
    Span("336", "11$astill image$bsti$2rdacontent$zfoo", null, 8),
    Span("600", "10$aFoo, Bar,$aFoo, Bar,$d2000-2020", null, 9)))

  /** (rule_id, loc joined with '/', msg) for the 9 expected invalid-record
    * violations, in the engine's canonical order.
    */
  val expectedInvalid: Seq[(String, String, String)] = {
    val ldrPat =
      "^[0-9]{5}[acdnp][acdefgijkmoprt][abcdims][\\sa][\\sa]22[0-9]{5}[\\s12345678uzIKLM][\\sacinu][\\sabc]4500$"
    Seq(
      ("string_pattern_mismatch", "leader", s"String should match pattern '$ldrPat'"),
      ("non_repeatable_field", "fields/001", "001: Has been marked as a non-repeating field."),
      ("missing_required_field", "fields/245", "One 245 field must be present in a MARC21 record."),
      ("multiple_1xx_fields", "fields/100/110",
        "1XX: Only one 1XX tag is allowed. Record contains: ['100', '110']"),
      ("control_field_length_invalid", "fields/006",
        "006: Length appears to be invalid. Reported length is: 6. Expected length is: 18"),
      ("invalid_indicator", "fields/336/ind1",
        "336 ind1: Invalid data (1). Indicator should be ['', ' ']."),
      ("invalid_indicator", "fields/336/ind2",
        "336 ind2: Invalid data (1). Indicator should be ['', ' ']."),
      ("subfield_not_allowed", "fields/336/z",
        "336 $z: Subfield cannot be defined in this field."),
      ("non_repeatable_subfield", "fields/600/a",
        "600 $a: Subfield cannot repeat."))
  }
}
