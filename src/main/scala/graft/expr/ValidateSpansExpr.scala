package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.rules.RuleSet
import graft.schema.{DocSchema, Span, Violation}

/** Row-at-a-time bridge between Tungsten rows and the pure Scala kernel.
  * One instance per plan (rules are plan constants — the reference resolves
  * rules by dict lookup per field, /root/reference/pydantic_marc/validators.py:59;
  * here the whole table rides along as a codegen reference object, so the
  * per-row pass is a single fused function call with zero lookups or joins).
  */
final class ValidatorKernel(val rules: RuleSet) extends Serializable {

  private val fastCheck = new FastCheck(rules)
  private val noViolations = new GenericArrayData(Array.empty[Any])

  /** (kinds, texts) ArrayData pair -> violations ArrayData. The
    * allocation-light fast path proves the common clean-doc case (FastCheck);
    * only ambiguous or failing docs pay for the full decode + check +
    * message rendering.
    */
  def validate(kinds: ArrayData, texts: ArrayData): ArrayData =
    if (fastCheck.clean(kinds, texts)) noViolations
    else validateFull(kinds, texts)

  private def validateFull(kinds: ArrayData, texts: ArrayData): ArrayData = {
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
      scala.collection.immutable.ArraySeq.unsafeWrapArray(decoded), rules)
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

/** Catalyst expression `validate_marc(kinds, texts)` ->
  * `array<struct<violation>>`, over the two parallel span-field arrays
  * (`spans.kind`, `spans.text`).
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
case class ValidateSpans(left: Expression, right: Expression, rules: RuleSet)
    extends BinaryExpression {

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"validate_marc expects (array<string>, array<string>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  @transient private lazy val kernel: ValidatorKernel = new ValidatorKernel(rules)

  override def dataType: DataType =
    ArrayType(DocSchema.violationType, containsNull = false)

  override def prettyName: String = "validate_marc"

  // keep the (large) rule table out of plan strings
  override def flatArguments: Iterator[Any] = Iterator(left, right)
  override def toString: String = s"validate_marc($left, $right)"
  override def sql: String = s"validate_marc(${left.sql}, ${right.sql})"

  override def nullSafeEval(kinds: Any, texts: Any): Any =
    kernel.validate(kinds.asInstanceOf[ArrayData], texts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernelRef =
      ctx.addReferenceObj("marcKernel", kernel, classOf[ValidatorKernel].getName)
    nullSafeCodeGen(ctx, ev, (k, t) => s"${ev.value} = $kernelRef.validate($k, $t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValidateSpans =
    copy(left = newLeft, right = newRight)
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
      Bridge.expression(kinds), Bridge.expression(texts), rules))
}
