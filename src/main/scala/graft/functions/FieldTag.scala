package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

import java.util.Locale

/** F5 field tagger as a single scalar pass.
  *
  * The declarative form (Taggers.classifyTextType) is a `when`-chain that
  * lowercases/trims the input once per BRANCH family; this fused form
  * lowercases once and runs all rule families over that one buffer. Same
  * observable semantics (FieldTagSpec asserts equivalence against the
  * when-chain AND the golden corpus); kept as the optional perf fusion
  * SURVEY.md §4 anticipates ("custom Expression `InvoiceFieldTag`").
  */
object FieldTag {

  /** Canonical scalar implementation — shared by the typed extraction path
    * (FastExtract) and the Catalyst expression below. */
  def classify(text: String): String = {
    val tl = text.toLowerCase(Locale.ROOT).trim
    def anyOf(ws: String*) = ws.exists(tl.contains)
    if (anyOf("facture", "invoice", "bill")) "header"
    else if (anyOf("€", "$", "eur", "usd", "ttc", "ht", "mad", "dh", "dhs")) "amount"
    else if ((tl.contains("date") || tl.contains("/") || tl.contains("-")) && text.length < 15) "date"
    else if (tl.contains("@") || tl.contains("email")) "email"
    else if (anyOf("tel", "phone", "+33", "01", "02", "03", "04", "05", "06", "07", "+212")) "phone"
    else if (anyOf("rue", "avenue", "place", "boulevard")) "address"
    else {
      val digitsOnly = text.replace(".", "").replace("-", "")
      if (digitsOnly.nonEmpty && digitsOnly.forall(c => c >= '0' && c <= '9')) "number"
      else "text"
    }
  }

  /** Java-callable entry point for generated code. */
  def classifyUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(classify(s.toString))
}

/** Catalyst expression: `invoice_field_tag(text)` — null-safe, codegen'd
  * (the generated code calls the same static classifier the interpreted
  * path uses, so the two can never diverge). */
case class InvoiceFieldTag(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"invoice_field_tag needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    FieldTag.classifyUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FieldTag.classifyUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): InvoiceFieldTag =
    copy(child = newChild)

  override def prettyName: String = "invoice_field_tag"
}

/** Session-extension injection (SparkSessionExtensions — the registration
  * mechanism SURVEY.md §2/§4 reserves for custom operators). Enables
  * `SELECT invoice_field_tag(text) ...` in SQL and
  * `call_function("invoice_field_tag", col)` in the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("invoice_field_tag"),
      new ExpressionInfo(classOf[InvoiceFieldTag].getName, "invoice_field_tag"),
      (exprs: Seq[Expression]) => InvoiceFieldTag(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("text_norm"),
      new ExpressionInfo(classOf[NormalizeText].getName, "text_norm"),
      (exprs: Seq[Expression]) => NormalizeText(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSim(exprs(0), exprs(1))))
  }
}
