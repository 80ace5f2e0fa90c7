package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two numeric vectors (each
  * side independently `ARRAY<FLOAT>` or `ARRAY<DOUBLE>`, like
  * [[CosineSimilarity]]).
  *
  * Exists for the norm-factored cosine form on N·C and pair-quadratic
  * scoring paths (IVF cell scoring, SemDeDup within-cell pairs, the e01
  * exact baseline): [[CosineSimilarity]] fuses dot + both norms in one
  * loop, but the norms depend on only ONE side each — recomputing them per
  * comparison triples the hot-loop flops. Callers precompute
  * `sqrt(dot_product(v, v))` once per vector/cell and score with
  * `dot_product(a, b) / nullif(na * nb, 0)`.
  *
  * Arithmetic parity: accumulation is element-order left-to-right, so
  * `dot_product(v, v)` equals the `na`/`nb` accumulators inside
  * `cosine_sim` bit-for-bit, and the factored quotient
  * `dot / (sqrt(na) * sqrt(nb))` is the IDENTICAL double expression
  * cosine_sim evaluates — the rewrite is exact, not approximate
  * (CosineParitySpec pins bitwise equality). `nullif(na * nb, 0)` maps
  * the zero-norm case to null exactly like cosine_sim (both norms are
  * non-negative, so the product is zero iff one of them is).
  *
  * Returns null for null or length-mismatched inputs; an empty pair dots
  * to null as well (cosine_sim is null there too).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _)  => true
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || n != y.numElements()) return null
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      def get(arr: String, idx: String, float: Boolean): String =
        if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $x.numElements();
         |if ($n == 0 || $n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${get(x, i, isFloat(left))} * ${get(y, i, isFloat(right))};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** DataFrame-API door; resolves through the session function registry. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
}
