// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Asymmetric-distance dot product (the "A" in FAISS's ADC): the dot of
  * a FULL-PRECISION query embedding against a PQ-CODED vector's
  * reconstruction, without ever materializing the reconstruction —
  * `Σ_s Σ_i emb[s·dsub + i] · means[s][code_s][i]`.
  *
  * The per-(subspace, cell, dim) mean table rides as ONE codegen
  * reference object (m·k·dsub doubles — the bounded-codebook contract,
  * same as [[KMeansCells]]' centroid state); the generated code is a
  * small m×dsub lookup loop, so codebook width never adds plan nodes.
  *
  * Numeric contract (oracle hash-parity): floats widen to double
  * (exact) and the accumulator runs LEFT-TO-RIGHT over (subspace asc,
  * dim asc) — exactly the oracle's one continued chain
  * `emb[1]·mean0[1] + … + emb[dsub]·mean0[dsub] + emb[dsub+1]·mean1[1] + …`
  * (left-assoc `+` regroups identically across subspace boundaries).
  * The mean doubles are the SAME IEEE `s/n` divisions the codebook twin
  * performs. A code outside [0, k) contributes nothing (defensive — the
  * argmin encoder cannot emit one).
  */
case class PqAdcDot(left: Expression, right: Expression,
    means: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with ExpectsInputTypes {
  require(means.nonEmpty, "PQ codebook must have at least one subspace")

  // Seq params for STRUCTURAL equality (canonicalization / CSE / codegen
  // cache keying — the LshBuckets note); primitive arrays in the loops.
  private lazy val mArr: Array[Array[Array[Double]]] =
    means.map(_.map(_.toArray).toArray).toArray
  private lazy val dsub: Int = means.head.headOption.map(_.size).getOrElse(0)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var s = 0
    val m = math.min(mArr.length, codes.numElements())
    while (s < m) {
      val c = codes.getInt(s)
      if (c >= 0 && c < mArr(s).length) {
        val mean = mArr(s)(c)
        val off = s * dsub
        var i = 0
        val n = math.min(mean.length, math.max(0, emb.numElements() - off))
        while (i < n) { dot += emb.getFloat(off + i).toDouble * mean(i); i += 1 }
      }
      s += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqMeans", mArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val mean = ctx.freshName("mean")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |double $dot = 0.0;
         |int $m = java.lang.Math.min($mRef.length, $b.numElements());
         |for (int $s = 0; $s < $m; $s++) {
         |  int $c = $b.getInt($s);
         |  if ($c >= 0 && $c < $mRef[$s].length) {
         |    double[] $mean = $mRef[$s][$c];
         |    int $off = $s * $dsub;
         |    int $n = java.lang.Math.min($mean.length,
         |      java.lang.Math.max(0, $a.numElements() - $off));
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $a.getFloat($off + $i) * $mean[$i];
         |    }
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqAdcDot {
  /** `adcDot(emb, codes)` — `means(s)(cell)(dim0based)` is the trained
    * codebook; rows for cells an encoder cannot emit may be zero-filled. */
  def adcDot(emb: Column, codes: Column, means: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqAdcDot(ExpressionUtils.expression(emb),
      ExpressionUtils.expression(codes),
      means.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}
