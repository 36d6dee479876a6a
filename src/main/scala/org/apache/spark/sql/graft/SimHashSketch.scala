// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** SimHash sketch over a token-hash array as one native expression:
  * bit j of the result is set when
  * `sum_t ((th[t]*a(j) + b(j)) mod p − half) >= 0`.
  *
  * The equivalent Column formulation is `nBits` separate `aggregate`
  * higher-order folds — interpreted lambdas, each re-walking the token
  * array (the same pathology that motivated [[DotProduct]]). This is
  * one fused token-outer loop accumulating all `nBits` band sums —
  * JIT-friendly, allocation-light, ~nBits× fewer array traversals.
  * Integer arithmetic is exact and order-insensitive, so the result is
  * bit-identical to the fold form and to the SQL oracle's
  * `list_sum(list_transform(...))` chains. */
case class SimHashSketch(child: Expression, as: Seq[Long], bs: Seq[Long],
    p: Long, half: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(as.length == bs.length && as.nonEmpty && as.length <= 62,
    s"need 1..62 bit constants, got ${as.length}")

  // Seq params (not Array): case-class equality must be STRUCTURAL so
  // canonicalization / subexpression elimination / codegen-cache keying
  // can identify two semantically equal sketch expressions — Array params
  // compare by reference and defeat all three. Arrays only inside the
  // hot loops.
  private lazy val aArr: Array[Long] = as.toArray
  private lazy val bArr: Array[Long] = bs.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any = {
    val th = a.asInstanceOf[ArrayData]
    val n = th.numElements()
    val sums = new Array[Long](aArr.length)
    var t = 0
    while (t < n) {
      val h = th.getLong(t)
      var j = 0
      while (j < aArr.length) {
        sums(j) += (h * aArr(j) + bArr(j)) % p - half
        j += 1
      }
      t += 1
    }
    var sketch = 0L
    var j = 0
    while (j < aArr.length) {
      if (sums(j) >= 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("simA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("simB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sums = ctx.freshName("sums")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sketch = ctx.freshName("sketch")
      s"""
         |long[] $sums = new long[$aRef.length];
         |int $n = $arr.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = $arr.getLong($t);
         |  for (int $j = 0; $j < $aRef.length; $j++) {
         |    $sums[$j] += ($h * $aRef[$j] + $bRef[$j]) % ${p}L - ${half}L;
         |  }
         |}
         |long $sketch = 0L;
         |for (int $j = 0; $j < $aRef.length; $j++) {
         |  if ($sums[$j] >= 0) $sketch |= (1L << $j);
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSketch {
  def sketch(th: Column, as: Array[Long], bs: Array[Long], p: Long, half: Long): Column =
    ExpressionUtils.column(SimHashSketch(ExpressionUtils.expression(th),
      as.toIndexedSeq, bs.toIndexedSeq, p, half))
}
