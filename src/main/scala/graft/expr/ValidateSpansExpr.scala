package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.rules.RuleSet
import graft.schema.{DocSchema, Span, Violation}

/** Row-at-a-time bridge between Tungsten rows and the pure Scala kernel.
  * One instance per plan (rules are plan constants — the reference resolves
  * rules by dict lookup per field, /root/reference/pydantic_marc/validators.py:59;
  * here the whole table rides along as a codegen reference object, so the
  * per-row pass is a single fused function call with zero lookups or joins).
  *
  * Field ordinals are resolved once from the child schema at plan time, so
  * any struct field order works without a codegen-fallback `transform`.
  */
final class ValidatorKernel(
    val rules: RuleSet,
    numFields: Int,
    kindOrd: Int,
    textOrd: Int,
    mediaOrd: Int,
    offsetOrd: Int,
    offsetIsLong: Boolean)
    extends Serializable {

  private val fastCheck = new FastCheck(rules)
  private val noViolations = new GenericArrayData(Array.empty[Any])

  /** spans ArrayData -> violations ArrayData. The allocation-light fast path
    * proves the common clean-doc case (FastCheck); only ambiguous or failing
    * docs pay for the full decode + check + message rendering.
    */
  def validate(spans: ArrayData): ArrayData =
    if (fastCheck.clean(spans, numFields, kindOrd, textOrd)) noViolations
    else validateFull(spans)

  private def validateFull(spans: ArrayData): ArrayData = {
    val n = spans.numElements()
    val decoded = new Array[Span](n)
    var i = 0
    while (i < n) {
      val r = spans.getStruct(i, numFields)
      val off =
        if (offsetOrd < 0 || r.isNullAt(offsetOrd)) i
        else if (offsetIsLong) r.getLong(offsetOrd).toInt
        else r.getInt(offsetOrd)
      decoded(i) = Span(
        if (r.isNullAt(kindOrd)) null else r.getUTF8String(kindOrd).toString,
        if (r.isNullAt(textOrd)) null else r.getUTF8String(textOrd).toString,
        if (mediaOrd < 0 || r.isNullAt(mediaOrd)) null
        else r.getUTF8String(mediaOrd).toString,
        off)
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

/** Catalyst expression `validate_marc(spans)` -> `array<struct<violation>>`.
  *
  * Custom because the check bundle (escape-aware subfield parsing, per-code
  * counters, Python-repr message rendering across 241 tag rules) is not
  * expressible as built-in columns without a 241-branch `when` chain that
  * would blow the codegen method-size limit. This stays inside whole-stage
  * codegen: `doGenCode` emits a single call on a reference object.
  */
case class ValidateSpans(child: Expression, rules: RuleSet)
    extends UnaryExpression {

  private def spanStruct: Option[StructType] = child.dataType match {
    case ArrayType(st: StructType, _) => Some(st)
    case _                            => None
  }

  private def ord(st: StructType, name: String): Int =
    st.fields.indexWhere(_.name == name)

  override def checkInputDataTypes(): TypeCheckResult = spanStruct match {
    case Some(st) if ord(st, "kind") >= 0 && ord(st, "text") >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"validate_marc expects array<struct<kind,text,...>>, got ${child.dataType.sql}")
  }

  @transient private lazy val kernel: ValidatorKernel = {
    val st = spanStruct.get
    val offOrd = ord(st, "offset")
    val offLong = offOrd >= 0 && st(offOrd).dataType == LongType
    new ValidatorKernel(rules, st.size,
      ord(st, "kind"), ord(st, "text"), ord(st, "media_ref"), offOrd, offLong)
  }

  override def dataType: DataType =
    ArrayType(DocSchema.violationType, containsNull = false)

  override def prettyName: String = "validate_marc"

  // keep the (large) rule table out of plan strings
  override def flatArguments: Iterator[Any] = Iterator(child)
  override def toString: String = s"validate_marc($child)"
  override def sql: String = s"validate_marc(${child.sql})"

  override def nullSafeEval(spans: Any): Any =
    kernel.validate(spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernelRef =
      ctx.addReferenceObj("marcKernel", kernel, classOf[ValidatorKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernelRef.validate($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ValidateSpans =
    copy(child = newChild)
}

object ValidateSpans {
  /** Column-level API: `ValidateSpans(col("spans"), rules)`. Struct field
    * order is free — ordinals are resolved from the schema; `kind` and
    * `text` are required, `media_ref`/`offset` optional.
    */
  def apply(spans: Column, rules: RuleSet): Column =
    Bridge.column(ValidateSpans(Bridge.expression(spans), rules))
}
