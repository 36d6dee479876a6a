// Lives under org.apache.spark.sql for the same reason as DotProduct:
// the expression-extension API surface is private[sql]. Graft code.
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * `TypedImperativeAggregate` — the bounded-state sketch family
  * (HLL-style) expressed so that the result is DETERMINISTIC and
  * engine-reproducible, which Spark's built-in `approx_count_distinct`
  * is not (its HLL++ hash has no ANSI-SQL twin, so no oracle could ever
  * hash-match it).
  *
  * State: the k smallest DISTINCT values of a caller-supplied hash
  * column (bounded: ≤ k longs however many rows flow in — the property
  * that makes a sketch shippable at 100 TB; partial aggregates merge by
  * set-union + re-trim). Estimate: with the hash uniform on [1, M],
  * the k-th smallest value h₍ₖ₎ estimates n̂ = (k−1)·M / h₍ₖ₎; below k
  * distinct values the sketch IS the exact set, so the exact count is
  * returned. The caller supplies the hash (e.g. an affine map in 2³¹
  * space) so the oracle can re-derive identical integers; the estimator
  * is one exact integer product (≤ 2³⁷, exact in double) and ONE IEEE
  * division — bit-reproducible in any engine.
  */
case class KmvDistinct(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  require(k >= 2, s"k must be at least 2, got $k")

  /** Hash-space size M: the caller's hash must map into [1, M]. */
  val M: Long = KmvDistinct.M

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.remove(buf.last) }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long], other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.remove(buf.last) }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) null
    else if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * M.toDouble / buf.last.toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def children: Seq[Expression] = Seq(child)
}

object KmvDistinct {

  /** Hash-space size 2³¹: big enough that collisions are negligible at
    * testdata scale, small enough that `(x mod M) · 2654435761 + 97`
    * stays below 2⁶³ — the same expression never overflows in an
    * engine that raises on int64 overflow (DuckDB) while Spark wraps. */
  val M: Long = 1L << 31

  /** The standard hash for [[kmv]]: affine map of a nonnegative id into
    * [1, M] — re-derivable in ANSI SQL as
    * `((x % 2147483648) * 2654435761 + 97) % 2147483648 + 1`. */
  def hashColumn(c: Column): Column =
    ((c % M) * 2654435761L + 97L) % M + 1L

  def kmv(hashed: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvDistinct(ExpressionUtils.expression(hashed), k).toAggregateExpression())
}
