package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.rules.{RuleJson, RuleSet}
import graft.schema.{DocSchema, Span, Violation}

/** Row-at-a-time bridge between Tungsten rows and the pure Scala kernel.
  * One instance per plan (rules are plan constants — the reference resolves
  * rules by dict lookup per field, /root/reference/pydantic_marc/validators.py:59;
  * here the whole table rides along as a codegen reference object, so the
  * per-row pass is a single fused function call with zero lookups or joins).
  *
  * Scope resolution (reference check_marc_rules, validators.py:27-72):
  *   - `rules`: plan-constant record-scope table (drives record-level AND,
  *     absent a context, field-level checks);
  *   - `contextRules`: plan-constant context scope — overrides the table
  *     FIELD checks resolve against, but never the record-level checks
  *     (validators.py:221-239 reads the record scope unconditionally);
  *   - per-ROW `recordRulesJson` (string column): data-driven record scope,
  *     replacing `rules` for that row entirely;
  *   - per-SPAN `spanRulesJson` (array<string> column): data-driven field
  *     scope, winning over everything for the spans where it is non-null.
  *
  * Rows with any data-driven override take the full-validation path; the
  * allocation-free fast path continues to serve override-free rows, with
  * its field/record tables split the same way (context vs record).
  */
final class ValidatorKernel(val rules: RuleSet, val contextRules: Option[RuleSet])
    extends Serializable {

  def this(rules: RuleSet) = this(rules, None)

  private val fieldDefault = contextRules.getOrElse(rules)
  private val fastCheck = new FastCheck(fieldDefault, rules)
  private val noViolations = new GenericArrayData(Array.empty[Any])

  /** (kinds, texts) ArrayData pair -> violations ArrayData. The
    * allocation-light fast path proves the common clean-doc case (FastCheck);
    * only ambiguous or failing docs pay for the full decode + check +
    * message rendering.
    */
  def validate(kinds: ArrayData, texts: ArrayData): ArrayData =
    if (fastCheck.clean(kinds, texts)) noViolations
    else validateFull(kinds, texts, rules, fieldDefault, _ => None)

  /** Override-aware entry: recordJson/spanRules may be null (no override). */
  def validateOverride(kinds: ArrayData, texts: ArrayData,
      recordJson: UTF8String, spanRules: ArrayData): ArrayData = {
    val hasSpanRules = spanRules != null && {
      var any = false; var i = 0
      while (!any && i < spanRules.numElements()) {
        any = !spanRules.isNullAt(i); i += 1
      }
      any
    }
    if (recordJson == null && !hasSpanRules) return validate(kinds, texts)
    val recordTable =
      if (recordJson == null) rules else RuleJson.parseCached(recordJson.toString)
    // context still outranks the row's record scope for FIELD checks
    // (validators.py:52-55: context wins whenever provided)
    val fieldTable = contextRules.getOrElse(recordTable)
    val perSpan: Int => Option[RuleSet] =
      if (!hasSpanRules) _ => None
      else i =>
        if (i < spanRules.numElements() && !spanRules.isNullAt(i))
          Some(RuleJson.parseCached(spanRules.getUTF8String(i).toString))
        else None
    validateFull(kinds, texts, recordTable, fieldTable, perSpan)
  }

  private def validateFull(kinds: ArrayData, texts: ArrayData,
      recordTable: RuleSet, fieldTable: RuleSet,
      perSpan: Int => Option[RuleSet]): ArrayData = {
    val n = kinds.numElements()
    val nt = texts.numElements()
    val decoded = new Array[Span](n)
    var i = 0
    while (i < n) {
      decoded(i) = Span(
        if (kinds.isNullAt(i)) null else kinds.getUTF8String(i).toString,
        if (i >= nt || texts.isNullAt(i)) null else texts.getUTF8String(i).toString,
        null, i)
      i += 1
    }
    val vs = MarcValidator.validate(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(decoded),
      recordTable, fieldTable, perSpan)
    new GenericArrayData(vs.map(toRow).toArray[Any])
  }

  private def u(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def toRow(v: Violation): InternalRow = {
    val keys = new GenericArrayData(v.ctx.keys.map(k => u(k)).toArray[Any])
    val vals = new GenericArrayData(v.ctx.values.map(x => u(x)).toArray[Any])
    InternalRow(
      u(v.rule_id),
      new GenericArrayData(v.loc.map(l => u(l)).toArray[Any]),
      u(v.tag), u(v.code), u(v.msg), u(v.input),
      new ArrayBasedMapData(keys, vals))
  }
}

/** Catalyst expression `validate_marc(kinds, texts[, record_rules,
  * span_rules])` -> `array<struct<violation>>`, over the two parallel
  * span-field arrays (`spans.kind`, `spans.text`) plus optional data-driven
  * rule-override columns.
  *
  * Custom because the check bundle (escape-aware subfield parsing, per-code
  * counters, Python-repr message rendering across 241 tag rules) is not
  * expressible as built-in columns without a 241-branch `when` chain that
  * would blow the codegen method-size limit. This stays inside whole-stage
  * codegen: `doGenCode` emits a single call on a reference object.
  *
  * Taking the extracted field arrays (instead of the array-of-struct column)
  * keeps Catalyst's nested-schema pruning alive: the parquet scan reads only
  * the kind/text leaf columns of `spans` (verified by plan inspection in
  * RowValidatorSpec), with no `arrays_zip` row materialization in between.
  */
case class ValidateSpans(children: Seq[Expression], rules: RuleSet,
    contextRules: Option[RuleSet] = None) extends Expression {

  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = false
  override lazy val deterministic: Boolean = true

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val shapes = children.map(_.dataType)
    val ok = (children.length == 2 || children.length == 4) &&
      isStringArray(shapes(0)) && isStringArray(shapes(1)) &&
      (children.length == 2 ||
        (shapes(2) == StringType && isStringArray(shapes(3))))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"validate_marc expects (array<string>, array<string>[, string, " +
        s"array<string>]), got ${shapes.map(_.sql).mkString(", ")}")
  }

  @transient private lazy val kernel: ValidatorKernel =
    new ValidatorKernel(rules, contextRules)

  override def dataType: DataType =
    ArrayType(DocSchema.violationType, containsNull = false)

  override def prettyName: String = "validate_marc"

  // keep the (large) rule table out of plan strings
  override def flatArguments: Iterator[Any] = children.iterator
  override def toString: String = s"validate_marc(${children.mkString(", ")})"
  override def sql: String = s"validate_marc(${children.map(_.sql).mkString(", ")})"

  override def eval(input: InternalRow): Any = {
    val kinds = children(0).eval(input)
    val texts = children(1).eval(input)
    if (kinds == null || texts == null) return null
    if (children.length == 2)
      kernel.validate(kinds.asInstanceOf[ArrayData], texts.asInstanceOf[ArrayData])
    else {
      val rj = children(2).eval(input)
      val sr = children(3).eval(input)
      kernel.validateOverride(
        kinds.asInstanceOf[ArrayData], texts.asInstanceOf[ArrayData],
        rj.asInstanceOf[UTF8String],
        if (sr == null) null else sr.asInstanceOf[ArrayData])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val kernelRef =
      ctx.addReferenceObj("marcKernel", kernel, classOf[ValidatorKernel].getName)
    val gens = children.map(_.genCode(ctx))
    val javaType = "org.apache.spark.sql.catalyst.util.ArrayData"
    val call =
      if (children.length == 2)
        s"$kernelRef.validate(${gens(0).value}, ${gens(1).value})"
      else
        s"$kernelRef.validateOverride(${gens(0).value}, ${gens(1).value}, " +
          s"${gens(2).isNull} ? null : ${gens(2).value}, " +
          s"${gens(3).isNull} ? null : ${gens(3).value})"
    val childCode = gens.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = ${gens(0).isNull} || ${gens(1).isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ($javaType) $call;
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ValidateSpans =
    copy(children = newChildren)
}

object ValidateSpans {
  /** Column-level API over the spans struct column:
    * `ValidateSpans(col("spans"), rules)` — extracts `spans.kind` and
    * `spans.text` so the scan can prune the other span fields.
    */
  def apply(spans: Column, rules: RuleSet): Column =
    apply(spans.getField("kind"), spans.getField("text"), rules)

  /** Column-level API over pre-extracted parallel field arrays. */
  def apply(kinds: Column, texts: Column, rules: RuleSet): Column =
    Bridge.column(ValidateSpans(
      Seq(Bridge.expression(kinds), Bridge.expression(texts)), rules))

  /** Full three-scope form: context scope (plan constant) plus data-driven
    * record/span override columns (pass lit(null) shapes when absent).
    */
  def apply(kinds: Column, texts: Column, rules: RuleSet,
      contextRules: Option[RuleSet], recordRulesJson: Column,
      spanRulesJson: Column): Column =
    Bridge.column(ValidateSpans(
      Seq(Bridge.expression(kinds), Bridge.expression(texts),
        Bridge.expression(recordRulesJson), Bridge.expression(spanRulesJson)),
      rules, contextRules))

  /** Context-scope-only form (no data-driven columns). */
  def apply(kinds: Column, texts: Column, rules: RuleSet,
      contextRules: Option[RuleSet]): Column =
    Bridge.column(ValidateSpans(
      Seq(Bridge.expression(kinds), Bridge.expression(texts)), rules, contextRules))
}
