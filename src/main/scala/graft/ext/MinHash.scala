package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash+LSH and SimHash near-duplicate detection over `documents`.
  *
  * All hashing is engine-agnostic integer arithmetic (no murmur/xxhash —
  * those differ per engine and would make the oracle unreproducible):
  *
  *  - string hash  h(s) = sum_i ascii(c_i) * ((i*131 + 7) % 99991)  mod 1000003
  *    (position-weighted char sum: order-independent SUM, so any SQL
  *    engine computes it identically; chars via split + empty-filter
  *    because Java regex split keeps a trailing "");
  *  - minhash_k    = min over shingle hashes of (A_k*h + B_k) mod 1000003;
  *  - LSH bands    = pairs of adjacent signature components packed into
  *    one int64 — candidate pairs share (band index, band value).
  *
  * Scale posture: the signature is a per-row projection; candidates come
  * from an equi-join on the band key (shuffle proportional to docs ×
  * bands, never n²); the final exact-Jaccard verify touches only
  * candidate pairs. This is the standard web-scale dedup shape
  * (shingle→minhash→band→bucket-join).
  */
object MinHash {

  val P = 1000003L
  val NumHashes = 12
  val BandSize = 2
  def numBands: Int = NumHashes / BandSize

  /** Per-k affine constants, derived (not random) so the oracle can emit
    * the same integers. */
  def hashA(k: Int): Long = ((k + 1).toLong * 2654435761L % P) | 1L
  def hashB(k: Int): Long = (k + 1).toLong * 40503L % P

  /** Engine-agnostic string hash (see object doc). */
  def stringHash(s: Column): Column = {
    val chars = filter(split(s, ""), c => c =!= "")
    val weighted = zip_with(chars, sequence(lit(1), size(chars)),
      (c, i) => ascii(c).cast(LongType) * ((i.cast(LongType) * 131L + 7L) % 99991L))
    aggregate(weighted, lit(0L), (a, x) => a + x) % P
  }

  /** SQL twin of [[stringHash]]. */
  def stringHashSql(s: String): String =
    s"list_sum(list_transform(list_filter(string_split($s, ''), c -> c <> ''), " +
      s"(c, i) -> ascii(c) * ((i * 131 + 7) % 99991))) % $P"

  /** doc_id + distinct-shingle hash array (docs shorter than n tokens
    * have no shingles and are dropped — nothing to near-dup on). */
  def shingleHashes(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"),
        array_distinct(transform(
          Text.shingles(split(col("text"), " "), n),
          s => stringHash(s))).as("hashes"))
      .filter(size(col("hashes")) > 0)

  /** MinHash signature columns sig0..sig{K-1}. */
  def withSignature(sh: DataFrame): DataFrame =
    (0 until NumHashes).foldLeft(sh) { (df, k) =>
      df.withColumn(s"sig$k",
        array_min(transform(col("hashes"), h => (h * hashA(k) + hashB(k)) % P)))
    }

  /** Candidate pairs sharing at least one LSH band, scored by signature
    * similarity (fraction of equal components) AND exact Jaccard over the
    * shingle-hash sets. */
  def nearDupPairs(documents: DataFrame, n: Int): DataFrame = {
    val sig = withSignature(shingleHashes(documents, n))
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"), (col(s"sig${2 * b}") * P + col(s"sig${2 * b + 1}")).as("bval"))
    }
    val banded = sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bval").as("bval"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sigCols = (0 until NumHashes).map(k => col(s"sig$k"))
    val withSig = sig.select(col("doc_id"), array(sigCols: _*).as("sig"), col("hashes"))
    cand
      .join(withSig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("hashes").as("h_a")), Seq("doc_a"))
      .join(withSig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("hashes").as("h_b")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast(LongType)),
          lit(0L), (a, x) => a + x).cast(DoubleType) / NumHashes).as("sig_similarity"),
        (size(array_intersect(col("h_a"), col("h_b"))).cast(DoubleType) /
          size(array_union(col("h_a"), col("h_b"))).cast(DoubleType)).as("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  val SimBits = 20

  /** SimHash sketch: bit j of the sketch is set when the sum over token
    * hashes of (2*bit_j(h) - 1) is non-negative. Near-dup docs differ in
    * few bits (compare via hamming distance on the int64 sketch). */
  def simHash(documents: DataFrame): DataFrame = {
    val tokHashes = transform(split(col("text"), " "), t => stringHash(t))
    val bits = (0 until SimBits).map { j =>
      val bitSum = aggregate(
        tokHashes, lit(0L),
        (acc, h) => acc + ((shiftright(h, j) % 2L) * 2L - 1L))
      when(bitSum >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    documents.select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }
}
