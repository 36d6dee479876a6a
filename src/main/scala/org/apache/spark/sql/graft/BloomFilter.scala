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

/** Bloom filter as a custom `TypedImperativeAggregate`: set MEMBERSHIP in
  * fixed state — the third sketch of the family ([[KmvDistinct]] answers
  * "how many distinct", [[CountMinSketch]] "how often", this one "is x
  * possibly a member"). Built once over a bounded reference set (a
  * benchmark suite's shingles, a blocklist, a key domain), it turns the
  * membership probe into a broadcast of `numBits` BITS — at corpus scale
  * the alternative is either shuffling the full probe side into an
  * equi-join or broadcasting every reference hash (8 bytes each); the
  * filter is hundreds of times smaller at a controlled false-positive
  * rate, and never false-negative.
  *
  * State: `numBits` bits packed 32 per int64 word (`numBits/32` longs,
  * fixed at plan time — independent of rows and cardinality). Only the
  * low 32 bits of each word are used: DuckDB (the oracle engine) raises
  * on `1::BIGINT << 63` overflow, so full 64-bit packing could never be
  * replayed in SQL; halving the packing keeps every mask ≤ 2³¹ on both
  * engines for the cost of one extra KiB per 32 Kibit. Update: set
  * `numHashes` bits at affine-hash positions of the key. Merge: bitwise
  * OR (bit sets are a semilattice, so partial aggregation and AQE
  * re-planning compose for free). Probe: all `numHashes` bits set →
  * "maybe present" (false-positive rate ≈ (1−e^(−kn/m))^k); any bit
  * clear → DEFINITELY absent, the guarantee decontamination leans on.
  *
  * Spark ships `BloomFilterAggregate` behind `DataFrameStatFunctions`,
  * but it hashes with Murmur3 — no ANSI-SQL twin, so no oracle could
  * re-derive the bits. Here positions are affine maps in 2³¹−1-space
  * (the [[CountMinSketch]] convention), exactly reproducible in any SQL
  * engine, which makes the filter — words AND probe verdicts —
  * hash-checkable bit-for-bit. SQL-callable as `graft_bloom` via
  * [[graft.GraftExtensions]]. */
case class BloomFilter(child: Expression, numBits: Int, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes {

  require(numBits >= 32 && numBits % 32 == 0,
    s"numBits must be a positive multiple of 32, got $numBits")
  require(numHashes >= 1 && numHashes <= BloomFilter.HashA.length,
    s"numHashes must be in [1, ${BloomFilter.HashA.length}], got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 32)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val p = BloomFilter.pos(x, i, numBits)
        buf(p >> 5) |= 1L << (p & 31)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilter =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilter =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def children: Seq[Expression] = Seq(child)
}

object BloomFilter {

  /** Modulus 2³¹−1 (Mersenne prime) — shared by the JVM update path and
    * the SQL probe/oracle spelling. */
  val P: Long = 2147483647L

  /** Per-hash affine constants; numHashes is bounded by this list. */
  val HashA: Array[Long] = Array(2654435761L, 1103515245L, 22695477L, 1664525L)
  val HashB: Array[Long] = Array(1013904223L, 12345L, 97L, 40503L)

  /** Hash-i bit position of key x in [0, numBits): the one definition the
    * imperative update, the Column probe, and the SQL oracle all share.
    * Sign-normalized so negative keys land in range; (x mod P) < 2³¹
    * times the largest a_i stays under 2⁶³ (raise-on-overflow-safe). */
  def pos(x: Long, i: Int, numBits: Int): Int =
    ((((x % P) * HashA(i) + HashB(i)) % P % numBits + numBits) % numBits).toInt

  /** The aggregate: a one-row array of bit words (32 bits per long). */
  def bloom(key: Column, numBits: Int, numHashes: Int): Column =
    ExpressionUtils.column(
      BloomFilter(ExpressionUtils.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Column twin of [[pos]], for probing from the words column. */
  private def posCol(key: Column, i: Int, numBits: Int): Column =
    (((key % P) * HashA(i) + HashB(i)) % P % numBits + numBits) % numBits

  /** Membership probe against a words column: every one of the key's
    * `numHashes` bits set. Word index / bit offset via shifts+mask (a
    * Column `/` is DOUBLE division; `>> 5` and `& 31` stay integral),
    * masks built by `shiftleft` so the probe inlines into whole-stage
    * codegen — usable inside HOF lambdas over a hash array. */
  def mightContain(words: Column, key: Column, numBits: Int, numHashes: Int): Column = {
    val probe = (0 until numHashes).map { i =>
      val p = posCol(key, i, numBits)
      val word = element_at(words,
        (call_function("shiftright", p, lit(5)) + 1L).cast(IntegerType))
      val mask = call_function("shiftleft", lit(1L), p.bitwiseAND(31L).cast(IntegerType))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
    // Probing with a numBits different from the build-side constant would
    // send element_at out of range — silent NULL verdicts in non-ANSI
    // mode. Fail loudly instead: the word count is numBits/32 by
    // construction (the aggregate enforces numBits % 32 == 0).
    when(size(words) === numBits / 32, probe).otherwise(raise_error(concat(
      lit(s"graft_bloom probe expects ${numBits / 32} words (numBits=$numBits), got "),
      size(words).cast(StringType))))
  }
}
