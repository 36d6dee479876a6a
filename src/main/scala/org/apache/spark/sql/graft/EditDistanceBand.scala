// This file lives under org.apache.spark.sql (the conventional home for
// third-party Catalyst expressions) because the expression-extension API
// surface (AbstractDataType, ExpressionUtils.column) is private[sql].
// It is graft's code, not Spark's — see the project root for license/origin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ukkonen k-band Levenshtein distance as a native Catalyst expression
  * — the custom-`Expression`-with-`doGenCode` extension point
  * (SURVEY.md §4.4) applied to the dedup-funnel verify step: the exact
  * BYTE-level edit distance when it is ≤ `k`, NULL when it exceeds `k`
  * (the candidate-killing verdict).
  *
  * Why an expression and not a typed `.map`: the flat-int-array DP has
  * no composition of built-in functions, but a Dataset map would wall
  * the pair pipeline behind DeserializeToObject/SerializeFromObject —
  * breaking whole-stage codegen and blocking Catalyst from moving
  * filters/projections across the boundary. This stays a plain column:
  * the candidate join, the byte-length projections and the DP verdict
  * all share one codegen stage.
  *
  * Semantics (oracle parity): BYTES, not characters — the oracle
  * engine's `levenshtein` is byte-based (an accented char costs 2
  * against its plain form), so both paths run the DP over UTF-8 bytes.
  * Cells outside the |i−j| ≤ k band are pinned at a saturating
  * sentinel; any edit path of total cost ≤ k never leaves the band
  * (each off-diagonal step costs ≥ 1), so in-band answers are EXACT.
  * The |len_a − len_b| > k pre-reject skips the DP entirely — O(1)
  * for most far pairs, O(k·len) otherwise, never O(len²).
  */
case class EditDistanceBand(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_edit_band"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val d = EditDistanceBand.dist(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes, k)
    if (d < 0) null else d.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dist")
      s"""
         |int $d = org.apache.spark.sql.graft.EditDistanceBand.dist(
         |  $a.getBytes(), $b.getBytes(), $k);
         |if ($d < 0) { ${ev.isNull} = true; } else { ${ev.value} = (long) $d; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditDistanceBand {
  /** Static kernel shared by the interpreted and codegen paths (one
    * implementation — the two paths cannot diverge): the exact
    * distance when ≤ `k`, −1 when it exceeds `k`. Two rolling int
    * rows, no per-cell allocation. */
  def dist(a: Array[Byte], b: Array[Byte], k: Int): Int = {
    val la = a.length; val lb = b.length
    if (math.abs(la - lb) > k) return -1
    val Inf = Int.MaxValue / 2 // saturating: Inf + 1 can't overflow
    var prev = new Array[Int](lb + 1); var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else Inf; j += 1 }
    var i = 1
    while (i <= la) {
      java.util.Arrays.fill(cur, Inf)
      cur(0) = if (i <= k) i else Inf
      val lo = math.max(1, i - k); val hi = math.min(lb, i + k)
      var jj = lo
      while (jj <= hi) {
        val sub = prev(jj - 1) + (if (a(i - 1) == b(jj - 1)) 0 else 1)
        val dl = prev(jj) + 1
        val in = cur(jj - 1) + 1
        cur(jj) = math.min(sub, math.min(dl, in))
        jj += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(lb) <= k) prev(lb) else -1
  }

  /** Column-API surface: `editDistance(a, b, k)` over two string
    * columns — nullable bigint. */
  def editDistance(a: Column, b: Column, k: Int): Column =
    ExpressionUtils.column(EditDistanceBand(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), k))
}
