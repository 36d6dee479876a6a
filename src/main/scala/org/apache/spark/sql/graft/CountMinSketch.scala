// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min sketch as a custom `TypedImperativeAggregate`: approximate
  * per-key frequencies for EVERY key of a group in one bounded-state
  * pass — the frequency complement to [[KmvDistinct]]'s distinct count.
  *
  * State: a depth×width grid of counters (d·w longs, fixed at plan time
  * — never grows with rows or key cardinality, the property that makes
  * the aggregate shippable at 100 TB where a per-key exact map is
  * unbounded). Update: each input key increments one counter per row of
  * the grid, at a per-row affine hash of the key. Merge: elementwise add
  * (counter grids are linear, so partial aggregation and AQE re-planning
  * compose for free). Point estimate: the MINIMUM of the key's d
  * counters — always ≥ the true count (counters only overcount, by
  * whatever collides into them), within εN with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Spark ships a CountMinSketch in its sketch library, but its update
  * path hashes with Murmur3 — no ANSI-SQL twin, so no oracle could ever
  * re-derive the grid. Here the d hash rows are affine maps in
  * 2³¹−1-space (`((x mod P)·a_i + b_i) mod P mod w`, sign-normalized),
  * exactly reproducible in any SQL engine, which makes the whole
  * sketch — grid contents AND estimates — hash-checkable bit-for-bit.
  * Overflow-safe in raise-on-overflow engines: (x mod P) < 2³¹ times
  * the largest a_i (≈2³¹·³) stays under 2⁶³. */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {

  require(depth >= 1 && depth <= CountMinSketch.HashA.length,
    s"depth must be in [1, ${CountMinSketch.HashA.length}], got $depth")
  require(width >= 2, s"width must be at least 2, got $width")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinSketch.cell(x, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def children: Seq[Expression] = Seq(child)
}

object CountMinSketch {

  /** Modulus 2³¹−1 (Mersenne prime) — shared by the JVM update path and
    * the SQL estimate/oracle spelling. */
  val P: Long = 2147483647L

  /** Per-row affine constants. Adding rows = appending pairs here; depth
    * is bounded by this list. */
  val HashA: Array[Long] = Array(1103515245L, 2654435761L, 22695477L, 1664525L)
  val HashB: Array[Long] = Array(12345L, 97L, 1L, 1013904223L)

  /** Row-i cell of key x in [0, width): the one hash definition the
    * imperative update, the Column estimate, and the SQL oracle all
    * share. Sign-normalized so negative keys land in range. */
  def cell(x: Long, i: Int, width: Int): Int =
    ((((x % P) * HashA(i) + HashB(i)) % P % width + width) % width).toInt

  /** The aggregate: a flattened depth×width counter grid. */
  def cms(key: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinSketch(ExpressionUtils.expression(key), depth, width)
        .toAggregateExpression())

  /** Column twin of [[cell]], for estimating from the sketch column. */
  private def cellCol(key: Column, i: Int, width: Int): Column =
    (((key % P) * HashA(i) + HashB(i)) % P % width + width) % width

  /** Point estimate from a sketch column: min of the key's d counters.
    * `element_at` is 1-based, hence the +1. */
  def estimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map(i => element_at(sketch, (cellCol(key, i, width) + i * width + 1).cast("int")))
      .reduce(least(_, _))
}
