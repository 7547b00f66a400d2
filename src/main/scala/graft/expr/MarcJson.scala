package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.Span

/** Canonical record serialization — the engine's analog of the reference's
  * `model_dump()` (/root/reference/pydantic_marc/models.py:89-95; field
  * shapes fields.py:66-69,117-128):
  *
  *   {"leader": <str>, "fields": [{tag: data} | {tag: {ind1, ind2,
  *    subfields: [{code: value}]}}, ...]}
  *
  * Python-json.dumps default separators (", " / ": ") for byte parity with
  * the reference's dumps. Media spans are an engine extension with no
  * reference analog and are omitted.
  */
object MarcJson {

  /** Python json.dumps default escaping, byte-exact: two-char escapes for
    * `" \\ \n \r \t \b \f`, \\uXXXX for other control chars AND (dumps
    * defaults to ensure_ascii=True) every char >= 0x80 — surrogate halves of
    * a Java String render as their own \\uXXXX, matching CPython's UTF-16
    * surrogate-pair rendering of astral chars.
    */
  private[expr] def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case x if x < ' ' || x >= 0x80 => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }

  def serialize(spans: Seq[Span]): String = {
    val sb = new java.lang.StringBuilder
    sb.append("{\"leader\": ")
    val ldr = spans.headOption.filter(_.kind == "LDR").map(_.text).getOrElse("")
    esc(sb, if (ldr == null) "" else ldr)
    sb.append(", \"fields\": [")
    var first = true
    spans.foreach { s =>
      if (s.kind != "LDR" && s.kind != "media") {
        if (!first) sb.append(", ")
        first = false
        sb.append('{')
        esc(sb, s.kind); sb.append(": ")
        val text = if (s.text == null) "" else s.text
        if (s.kind != null && s.kind.startsWith("00")) esc(sb, text)
        else {
          val ind1 = if (text.length >= 1) text.substring(0, 1) else ""
          val ind2 = if (text.length >= 2) text.substring(1, 2) else ""
          sb.append("{\"ind1\": "); esc(sb, ind1)
          sb.append(", \"ind2\": "); esc(sb, ind2)
          sb.append(", \"subfields\": [")
          val subs = MarcValidator.parseSubfields(text)
          var sf = true
          subs.foreach { case (c, v) =>
            if (!sf) sb.append(", ")
            sf = false
            sb.append('{'); esc(sb, c.toString); sb.append(": "); esc(sb, v); sb.append('}')
          }
          sb.append("]}")
        }
        sb.append('}')
      }
    }
    sb.append("]}")
    sb.toString
  }

  def column(spans: Column): Column =
    Bridge.column(MarcJsonExpr(Bridge.expression(spans)))
}

/** `marc_json(spans)` -> string (codegen via kernel call, like ValidateSpans). */
case class MarcJsonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "marc_json"

  @transient private lazy val ords: (Int, Int, Int) = child.dataType match {
    case ArrayType(st: StructType, _) =>
      (st.fields.indexWhere(_.name == "kind"), st.fields.indexWhere(_.name == "text"), st.size)
    case _ => (-1, -1, -1)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (kOrd, tOrd, nf) = ords
    val spans = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, nf)
      Span(
        if (r.isNullAt(kOrd)) null else r.getUTF8String(kOrd).toString,
        if (r.isNullAt(tOrd)) null else r.getUTF8String(tOrd).toString,
        null, i)
    }
    UTF8String.fromString(MarcJson.serialize(spans))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("marcJson", this, classOf[MarcJsonExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarcJsonExpr =
    copy(child = newChild)
}
