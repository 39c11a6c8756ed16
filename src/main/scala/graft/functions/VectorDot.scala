package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — dot product of two embedding arrays in double
  * precision, as a native Catalyst expression with `doGenCode` (whole-stage
  * codegen). This is the hot scalar of every similarity operator: the
  * verify stage of near-dup mining evaluates it once per candidate PAIR, so
  * at banded-LSH candidate volumes the interpreted HOF form
  * (`aggregate(zip_with(...))`, ~µs/call) caps throughput two orders of
  * magnitude below this loop.
  *
  * Semantics are EXACTLY the left-fold of the HOF form it replaces
  * (`aggregate(zip_with(a, b, (x,y) => x.cast(double)*y.cast(double)),
  * 0.0, (acc,v) => acc + v)`), bit-for-bit:
  *   - elements are widened to double, products accumulated left→right
  *     (same IEEE sequence → same rounding → DuckDB-oracle hash parity);
  *   - length mismatch → null (zip_with pads with null, null poisons the
  *     fold);
  *   - any null element → null (same poisoning).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<float> or two array<double> arguments, " +
          s"got ${left.dataType} and ${right.dataType}")
    }

  private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc +=
        (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) *
          (if (isFloat) y.getFloat(i).toDouble else y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$get($i) * (double) $b.$get($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
