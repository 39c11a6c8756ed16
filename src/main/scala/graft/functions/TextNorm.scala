package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.util.Locale

/** Accent-and-case normalization for dedup/linking keys — the canonical
  * text-key fold every multilingual curation pipeline needs before exact
  * dedup, gazetteer joins, or entity blocking ("Société Générale" ≡
  * "societe generale"). Spark ships no Unicode-normalization expression,
  * and a Scala UDF would be an opaque non-codegen black box — so this is
  * a native Catalyst `UnaryExpression` (the §2.10 pattern): interpreted
  * and generated paths call the SAME static normalizer, so they can never
  * diverge.
  *
  * Semantics (replayable cross-engine: `lower(strip_accents(text))` in
  * DuckDB agrees for Latin-script input): Unicode NFD decomposition →
  * strip combining marks (\p{M}) → lowercase(ROOT). Pure per-row compute —
  * embarrassingly parallel, never a shuffle. */
object TextNorm {

  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Canonical scalar implementation — the single source of truth for the
    * interpreted eval, the generated code, and the spec's expectations. */
  def normalize(s: String): String = {
    val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    Marks.matcher(decomposed).replaceAll("").toLowerCase(Locale.ROOT)
  }

  /** Java-callable entry point for generated code. */
  def normalizeUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))

  /** Column form, usable on ANY session (no extension install needed). */
  def normCol(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
  }
}

/** Catalyst expression: `text_norm(s)` — null-safe, codegen'd. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_norm needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "text_norm"
}
