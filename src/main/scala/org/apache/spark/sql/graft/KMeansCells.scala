// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Trained-k-means cell scoring as native Catalyst expressions: the
  * argmin cell ([[KMeansArgmin]]) and the `nProbe` nearest cells
  * ([[KMeansProbe]]) of a quantized `array<bigint>` vector against a
  * driver-held exact centroid table.
  *
  * Why an expression and not the k×d literal tree `graft.ext.Cluster`
  * originally built: at k=8/d=64 the unrolled struct-array-sort argmin
  * is 512 multiply-add nodes — workable — but a real IVF coarse
  * quantizer wants k in the 10²–10⁴ range, where the literal tree blows
  * past codegen method limits and falls back to interpreted eval (the
  * same ceiling [[DotProduct]] and [[LshBuckets]] exist to avoid). Here
  * the centroid table rides along as ONE codegen reference object and
  * the generated code is a small k×d loop: dim- and k-agnostic,
  * JIT-friendly, allocation-free for the argmin.
  *
  * Numeric contract (oracle hash-parity), identical to the tree it
  * replaces: the dot of the int64 quantized vector against the int64
  * centroid component sums runs in LONG (exact, so accumulation order
  * is irrelevant); the score is then exactly two IEEE divisions and one
  * add over driver-precomputed doubles —
  * `(double) dot * -2.0 / n + |s|²/n²` — the op sequence the oracle
  * spells `CAST(dot AS DOUBLE) * -2.0 / n + CAST(nsq AS DOUBLE)/(n*n)`.
  * Ties break to the LOWEST cell id: cells are pre-sorted ascending at
  * construction and only a STRICTLY smaller score displaces, which is
  * the loop form of the oracle's
  * `row_number() OVER (ORDER BY score, cell)`.
  *
  * State is passed as Seqs, not Arrays: case-class equality must be
  * STRUCTURAL for canonicalization / subexpression elimination /
  * codegen-cache keying (same fix as [[LshBuckets]]); hot loops read
  * the lazily-derived primitive arrays.
  */
trait KMeansScoring { self: UnaryExpression =>
  /** Ascending cell ids (sorted at construction by the builders). */
  def cells: Seq[Int]
  /** Per-cell member count as double (the score's divisor). */
  def ns: Seq[Double]
  /** Per-cell |s|²/n², precomputed driver-side in exact-then-IEEE math. */
  def nsqOverN2: Seq[Double]
  /** Per-cell per-dimension exact int64 component sums. */
  def sums: Seq[Seq[Long]]

  protected lazy val cellArr: Array[Int] = cells.toArray
  protected lazy val nArr: Array[Double] = ns.toArray
  protected lazy val nsqArr: Array[Double] = nsqOverN2.toArray
  protected lazy val sumArr: Array[Array[Long]] = sums.map(_.toArray).toArray

  protected def requireWellFormed(): Unit = {
    require(cells.nonEmpty, "k-means scoring needs at least one centroid")
    require(cells.size == ns.size && cells.size == nsqOverN2.size &&
      cells.size == sums.size, "centroid state arity mismatch")
    require(cells.sliding(2).forall(p => p.size < 2 || p(0) < p(1)),
      "centroid cells must be strictly ascending")
  }

  /** Shared interpreted scoring loop: score of `q` against cell index
    * `c` — the reference semantics codegen mirrors line for line. */
  protected final def scoreOf(q: ArrayData, c: Int): Double = {
    val s = sumArr(c)
    val n = math.min(q.numElements(), s.length)
    var dot = 0L
    var i = 0
    while (i < n) { dot += q.getLong(i) * s(i); i += 1 }
    dot.toDouble * -2.0 / nArr(c) + nsqArr(c)
  }

  /** The generated scoring statement bodies, shared by both expressions:
    * declares `double <score>` for centroid index `<c>` over input `<a>`. */
  protected final def genScore(ctx: CodegenContext, a: String, sums: String,
      nRef: String, nsqRef: String, c: String, score: String): String = {
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    s"""
       |long[] $s = $sums[$c];
       |int $n = java.lang.Math.min($a.numElements(), $s.length);
       |long $dot = 0L;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += $a.getLong($i) * $s[$i];
       |}
       |double $score = (double) $dot * -2.0 / $nRef[$c] + $nsqRef[$c];
     """.stripMargin
  }
}

/** Argmin cell id of a quantized vector — one Lloyd assignment. */
case class KMeansArgmin(child: Expression, cells: Seq[Int], ns: Seq[Double],
    nsqOverN2: Seq[Double], sums: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes with KMeansScoring {
  requireWellFormed()

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_kmeans_argmin"

  override def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    var best = scoreOf(q, 0)
    var bestCell = cellArr(0)
    var c = 1
    while (c < cellArr.length) {
      val sc = scoreOf(q, c)
      if (sc < best) { best = sc; bestCell = cellArr(c) }
      c += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sums = ctx.addReferenceObj("kmSums", sumArr, "long[][]")
    val nRef = ctx.addReferenceObj("kmNs", nArr, "double[]")
    val nsqRef = ctx.addReferenceObj("kmNsqs", nsqArr, "double[]")
    val cellsRef = ctx.addReferenceObj("kmCells", cellArr, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      val score = ctx.freshName("score")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestCell = $cellsRef[0];
         |for (int $c = 0; $c < $cellsRef.length; $c++) {
         |  ${genScore(ctx, a, sums, nRef, nsqRef, c, score)}
         |  if ($score < $best) { $best = $score; $bestCell = $cellsRef[$c]; }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` nearest cell ids in (score asc, cell asc) rank order —
  * the IVF probe list; element 1 is the argmin (the index cell). */
case class KMeansProbe(child: Expression, cells: Seq[Int], ns: Seq[Double],
    nsqOverN2: Seq[Double], sums: Seq[Seq[Long]], nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes with KMeansScoring {
  requireWellFormed()
  require(nProbe >= 1 && nProbe <= cells.size,
    s"nProbe must be in [1,${cells.size}], got $nProbe")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_kmeans_probe"

  override def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val topCell = new Array[Int](nProbe)
    val topScore = new Array[Double](nProbe)
    var filled = 0
    var c = 0
    while (c < cellArr.length) {
      val sc = scoreOf(q, c)
      // ascending-cell iteration + strict < keeps ties on the lower cell
      var pos = filled
      while (pos > 0 && sc < topScore(pos - 1)) pos -= 1
      if (pos < nProbe) {
        val upTo = math.min(filled, nProbe - 1)
        var sh = upTo
        while (sh > pos) { topScore(sh) = topScore(sh - 1); topCell(sh) = topCell(sh - 1); sh -= 1 }
        topScore(pos) = sc; topCell(pos) = cellArr(c)
        if (filled < nProbe) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == nProbe) topCell else topCell.take(filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sums = ctx.addReferenceObj("kmSums", sumArr, "long[][]")
    val nRef = ctx.addReferenceObj("kmNs", nArr, "double[]")
    val nsqRef = ctx.addReferenceObj("kmNsqs", nsqArr, "double[]")
    val cellsRef = ctx.addReferenceObj("kmCells", cellArr, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val topCell = ctx.freshName("topCell")
      val topScore = ctx.freshName("topScore")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val score = ctx.freshName("score")
      val pos = ctx.freshName("pos")
      val upTo = ctx.freshName("upTo")
      val sh = ctx.freshName("sh")
      val out = ctx.freshName("out")
      s"""
         |int[] $topCell = new int[$nProbe];
         |double[] $topScore = new double[$nProbe];
         |int $filled = 0;
         |for (int $c = 0; $c < $cellsRef.length; $c++) {
         |  ${genScore(ctx, a, sums, nRef, nsqRef, c, score)}
         |  int $pos = $filled;
         |  while ($pos > 0 && $score < $topScore[$pos - 1]) $pos--;
         |  if ($pos < $nProbe) {
         |    int $upTo = java.lang.Math.min($filled, $nProbe - 1);
         |    for (int $sh = $upTo; $sh > $pos; $sh--) {
         |      $topScore[$sh] = $topScore[$sh - 1];
         |      $topCell[$sh] = $topCell[$sh - 1];
         |    }
         |    $topScore[$pos] = $score;
         |    $topCell[$pos] = $cellsRef[$c];
         |    if ($filled < $nProbe) $filled++;
         |  }
         |}
         |int[] $out = ($filled == $nProbe) ? $topCell
         |  : java.util.Arrays.copyOf($topCell, $filled);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KMeansCells {
  /** Column builders; `state` is (cell, n, nsqOverN2, componentSums),
    * sorted ascending by cell here so tie-breaks are total. */
  def argmin(q: Column, state: Seq[(Int, Double, Double, Seq[Long])]): Column = {
    val st = state.sortBy(_._1)
    ExpressionUtils.column(KMeansArgmin(ExpressionUtils.expression(q),
      st.map(_._1), st.map(_._2), st.map(_._3), st.map(_._4.toIndexedSeq)))
  }

  def probe(q: Column, state: Seq[(Int, Double, Double, Seq[Long])], nProbe: Int): Column = {
    val st = state.sortBy(_._1)
    ExpressionUtils.column(KMeansProbe(ExpressionUtils.expression(q),
      st.map(_._1), st.map(_._2), st.map(_._3), st.map(_._4.toIndexedSeq), nProbe))
  }
}
