package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential left-fold dot product of two numeric-array columns, as a
  * native codegen expression: Σ widen(x(i)) · widen(y(i)), accumulated
  * left to right from 0.0. Each side is a float or double array;
  * float elements widen to double exactly as `.cast("double")` does.
  *
  * This is ARITHMETICALLY IDENTICAL to the higher-order-function
  * formulation it replaces (`aggregate(zip_with(x, y, (p, q) =>
  * p.cast("double") * q.cast("double")), 0.0, _ + _)`) — same element
  * order, same widening, same IEEE adds — so every oracle that replays
  * the fold as DuckDB `list_sum ∘ list_transform` still hash-matches
  * bitwise. What changes is execution: the HOF pair (ZipWith +
  * ArrayAggregate) is CodegenFallback — interpreted closures and a
  * materialized product array PER PAIR — which is the hot path of every
  * candidate-scoring join (bucketed near-dup, semantic dedup, ANN
  * verify: O(candidates) folds of 64 elements each) and of per-row LSH
  * signatures (nBits folds per document). This compiles to a tight
  * primitive loop inside whole-stage codegen.
  *
  * Null semantics mirror the HOF tree: any null element, a length
  * mismatch (zip_with pads with null), or a null input array yields
  * null. The L2 norm is the same fold on one array: sqrt(dot(x, x)).
  */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs float/double arrays, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_fold"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val x = xAny.asInstanceOf[ArrayData]
    val y = yAny.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloat(left), isFloat(right))
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, idx: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(x, i, isFloat(left))} * ${get(y, i, isFloat(right))};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

object DotFold {
  /** Column API: dot_fold(x, y). */
  def apply(x: Column, y: Column): Column =
    CatalystBridge.column(
      DotFold(CatalystBridge.expression(x), CatalystBridge.expression(y)))
}
