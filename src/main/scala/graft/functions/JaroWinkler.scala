package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Winkler 1990) as a native codegen expression —
  * the standard name-matching score entity linking pairs with edit
  * distance (Jaro rewards shared characters near their original
  * positions; the Winkler prefix boost encodes that surnames/companies
  * rarely diverge in the first letters). Spark ships levenshtein but no
  * Jaro family; a Scala UDF would be an opaque non-codegen box.
  *
  * Contract: CODEPOINT-based; either side empty → 0; match window
  * floor(max/2) − 1; jaro = (m/l₁ + m/l₂ + (m−t)/m)/3 with t =
  * half-transpositions; the 0.1·prefix(≤4) boost applies ONLY when
  * jaro > 0.7. Probe-verified equal to DuckDB's
  * jaro_winkler_similarity on ASCII, including the boost threshold
  * (DuckDB leaves jaro=0.535 unboosted despite a 3-char prefix) — but
  * DuckDB scores UTF-8 BYTES, so on non-ASCII the two diverge
  * ('société générale' vs its unaccented fold: 0.8583 here, 0.8367
  * byte-based); codepoints are the deliberate choice — an accent should
  * be one edit, not two. Interpreted and generated paths call the same
  * static scorer. */
object JaroWinkler {

  def jaro(a: String, b: String): Double = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val (l1, l2) = (s.length, t.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sMatch = new Array[Boolean](l1)
    val tMatch = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (sMatch(i)) {
        while (!tMatch(j)) j += 1
        if (s(i) != t(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - trans / 2.0) / md) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val sa = a.codePoints().toArray
    val tb = b.codePoints().toArray
    var p = 0
    val n = math.min(4, math.min(sa.length, tb.length))
    while (p < n && sa(p) == tb(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  /** Java-callable entry point for generated code. */
  def jwUtf8(a: UTF8String, b: UTF8String): Double =
    jaroWinkler(a.toString, b.toString)

  /** Column form, usable on ANY session. */
  def jwCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(JaroWinklerSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Catalyst expression: `jaro_winkler(a, b)` — null-safe, codegen'd. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two string arguments, got " +
          s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jwUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.jwUtf8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
