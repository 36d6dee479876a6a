// This file lives under org.apache.spark.sql (the conventional home for
// third-party Catalyst expressions) because the expression-extension API
// surface (AbstractDataType, ExpressionUtils.column) is private[sql].
// It is graft's code, not Spark's — see the project root for license/origin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-embedding dot product —
  * the custom-`Expression`-with-`doGenCode` extension point (SURVEY.md
  * §4.4) used where built-in operators genuinely fall short:
  *
  *  - a `zip_with`+`aggregate` fold evaluates interpreted (lambda HOFs
  *    get no codegen) and allocates an intermediate array per row;
  *  - an unrolled 64-term `element_at` chain codegens into a method so
  *    large HotSpot won't JIT it, and it hard-codes the dimension.
  *
  * This expression generates ONE tight primitive loop (dim-agnostic,
  * JIT-friendly, allocation-free) inside whole-stage codegen.
  *
  * Numeric contract (oracle parity): floats are widened to double
  * (exact) and accumulated LEFT-TO-RIGHT — bit-identical to the SQL
  * oracle's `a[1]*b[1] + a[2]*b[2] + ...` chain and to the interpreted
  * `nullSafeEval` path.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API surface: `dot(a, b)` over two `array<float>` columns. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
