package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FULL Damerau–Levenshtein distance (Lowrance & Wagner 1975 — unrestricted
  * transpositions with the per-alphabet last-seen table, NOT the weaker
  * OSA/"restricted" variant: DL("ca","abc") = 2 where OSA says 3) as a
  * native codegen expression. Spark ships levenshtein only; typo-heavy
  * surface forms ("recieve"/"receive", swapped digits in invoice ids) are
  * one transposition — charging them 2 edits mis-ranks ER candidates.
  *
  * Contract: CODEPOINT-based (an accent is one edit — the JaroWinkler
  * decision); null if either side null. Probe-verified equal to DuckDB's
  * independent damerau_levenshtein on ASCII (including the ca→abc
  * full-DL discriminator), which is what makes q159 a true cross-engine
  * oracle; DuckDB scores UTF-8 bytes, so non-ASCII diverges by design.
  * O(|a|·|b|) per pair — band by length and block before calling it at
  * corpus scale (the q88/q129 pattern). Interpreted and generated paths
  * call the same static scorer. */
object Damerau {

  def distance(a: String, b: String): Int = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val (n, m) = (s.length, t.length)
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = scala.collection.mutable.HashMap.empty[Int, Int]
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da.getOrElse(t(j - 1), 0)
        val l = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - 1 - k) + 1 + (j - 1 - l)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da(s(i - 1)) = i
      i += 1
    }
    d(n + 1)(m + 1)
  }

  /** Java-callable entry point for generated code. */
  def distanceUtf8(a: UTF8String, b: UTF8String): Int =
    distance(a.toString, b.toString)

  def distCol(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Catalyst expression: `damerau_levenshtein(a, b)` — null-safe, codegen'd. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"damerau_levenshtein needs string arguments, got " +
          s"${left.dataType}, ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Damerau.distanceUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Damerau.distanceUtf8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}
