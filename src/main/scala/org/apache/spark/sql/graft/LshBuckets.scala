// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Sign-bit LSH bucket key as one native Catalyst expression: bit j of
  * the result is set when `sum_i emb[i] * weights(j)(i) >= 0`.
  *
  * The expression-chain formulation (nBits × dim `element_at` terms) was
  * a single generated method too large for HotSpot to JIT; this loop is
  * small, dim-agnostic, and the weight matrix rides along as a codegen
  * reference object. Accumulation per plane is LEFT-TO-RIGHT in double,
  * matching the SQL oracle's literal `+` chains bit-exactly (the weights
  * themselves are derived with the same IEEE ops the oracle re-derives).
  */
case class LshBuckets(child: Expression, weights: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  // Seq params (not Array): case-class equality must be STRUCTURAL so
  // canonicalization / subexpression elimination / codegen-cache keying
  // can identify two semantically equal bucket expressions — Array
  // params compare by reference and defeat all three (same fix as
  // SimHashSketch). Arrays only inside the hot loops.
  private lazy val wArr: Array[Array[Double]] = weights.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < wArr.length) {
      val w = wArr(j)
      val n = math.min(x.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * w(i); i += 1 }
      if (s >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshWeights", wArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bucket = ctx.freshName("bucket")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      s"""
         |long $bucket = 0L;
         |for (int $j = 0; $j < $w.length; $j++) {
         |  double[] wj = $w[$j];
         |  int $n = java.lang.Math.min($a.numElements(), wj.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * wj[$i];
         |  }
         |  if ($s >= 0) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  def buckets(emb: Column, weights: Array[Array[Double]]): Column =
    ExpressionUtils.column(LshBuckets(ExpressionUtils.expression(emb),
      weights.map(_.toIndexedSeq).toIndexedSeq))
}
