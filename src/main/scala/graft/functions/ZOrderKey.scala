package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) clustering key — THE data-layout primitive for
  * multi-column pruning at 100 TB. Sorting a table by `zorder_key(x, y)`
  * before writing makes every parquet file cover a small hyper-rectangle
  * of (x, y) space simultaneously, so row-group min/max statistics prune
  * predicates on EITHER column (a plain `ORDER BY x` layout prunes x but
  * leaves every file spanning the full y domain). Spark has no built-in
  * (Delta/Iceberg implement it engine-side); a UDF would be an opaque
  * non-codegen box, so this is a native variadic expression — interpreted
  * and generated paths call the same static interleaver.
  *
  * Contract (replayable in plain SQL bit arithmetic, see q137's oracle):
  * n children (2 ≤ n ≤ 8), each LONG, each truncated to its LOW
  * b = 64/n bits; result bit (i·n + c) = bit i of child c — child 0
  * occupies the least-significant lane. Callers pre-scale values into
  * [0, 2^b) (rank- or range-normalize first for skewed/negative domains);
  * any null child → null key. */
object ZOrderKey {

  /** General interleaver — single source of truth (n = vals.length). */
  def interleave(vals: Array[Long]): Long = {
    val n = vals.length
    val b = 64 / n
    var r = 0L
    var c = 0
    while (c < n) {
      val v = vals(c)
      var i = 0
      while (i < b) {
        r |= ((v >>> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    r
  }

  /** Allocation-free 2-column fast path (magic-mask bit spread); must be
    * bit-identical to `interleave(Array(x, y))` — asserted in the spec. */
  def interleave2(x: Long, y: Long): Long =
    spread1(x) | (spread1(y) << 1)

  private def spread1(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column form: children are cast to long by the caller (`Layout.zorderKey`
    * does it for you). */
  def keyCol(cols: Column*): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ZOrderKeyExpr(cols.map(ColumnBridge.expression)))
  }
}

/** Catalyst expression: `zorder_key(c0, c1, …)` → LONG, null-safe, codegen'd. */
case class ZOrderKeyExpr(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key takes 2..8 columns, got ${children.size}")
    else if (children.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder_key needs LONG children, got ${children.map(_.dataType).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val vals = new Array[Long](n)
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      vals(c) = v.asInstanceOf[Long]
      c += 1
    }
    if (n == 2) ZOrderKey.interleave2(vals(0), vals(1))
    else ZOrderKey.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val call =
      if (children.length == 2)
        s"graft.functions.ZOrderKey.interleave2(${evals(0).value}, ${evals(1).value})"
      else
        s"graft.functions.ZOrderKey.interleave(new long[]{${evals.map(_.value).mkString(", ")}})"
    val childBlocks = evals.map { e =>
      s"""${e.code}
         |if (${e.isNull}) { ${ev.isNull} = true; }""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long ${ev.value} = 0L;
      $childBlocks
      if (!${ev.isNull}) { ${ev.value} = $call; }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyExpr =
    copy(children = newChildren)

  override def prettyName: String = "zorder_key"
}
