package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-wide rolling polynomial fingerprint
  * `h := (h·31 + codepoint) mod (2³¹−1)` as a native codegen expression.
  *
  * Semantics are EXACTLY the declarative fold it replaces
  * (`aggregate(split(text, ""), 0L, (h, c) -> pmod(h*31 + ascii(c), M))`,
  * the q28-oracled engine PRNG): `split(text, "")` yields one element per
  * Unicode CODE POINT (Java's empty-regex split never cuts a surrogate
  * pair) and `ascii` returns the element's first code point — so the fold
  * is a code-point iteration, which is what this expression does over the
  * UTF8 bytes directly. FingerprintParitySpec locks the equivalence on
  * ASCII, accented, CJK, astral (surrogate-pair) and empty inputs.
  *
  * Why native (§4 expressions-and-codegen): the HOF form is interpreted —
  * per character it allocated a 1-char UTF8String inside a per-row array
  * from the regex split, then evaluated three interpreted expression
  * nodes. On fingerprint-heavy paths (negative-sampling draws, winnowing
  * grams, stratified sampling, KMV/Bloom hashing) that was the dominant
  * per-row cost. Here the fold is one branch-free byte walk, identical in
  * the interpreted and generated paths. */
object Fingerprint {

  val M = 2147483647L // 2^31 - 1

  /** Canonical scalar implementation — single source of truth for the
    * interpreted eval, the generated code, and the parity spec. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xe0) == 0xc0) { len = 2; cp = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { len = 3; cp = b0 & 0x0f }
      else { len = 4; cp = b0 & 0x07 }
      var j = 1
      while (j < len && i + j < n) { cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1 }
      h = (h * 31 + cp) % M
      i += len
    }
    h
  }

  /** Column form, usable on ANY session (no extension install needed). */
  def col(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(c)))
  }
}

/** Catalyst expression: `fingerprint(s)` — null-safe, codegen'd. */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)

  override def prettyName: String = "fingerprint"
}
