package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives for dedup / nearest-neighbor over text shingles and
  * embedding vectors. Column combinators only — higher-order functions
  * (transform/aggregate/zip_with) keep everything inside Catalyst.
  */
object SimilarityFunctions {

  /** Character n-gram shingles of the normalized text (distinct). */
  def charShingles(text: Column, n: Int): Column = {
    val norm = TextFunctions.normalized(text)
    array_distinct(
      transform(sequence(lit(0), greatest(length(norm) - n, lit(0))),
        i => substring(norm, lit(1) + i, lit(n))))
  }

  /** Word n-gram shingles (distinct), joined with ''. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(TextFunctions.normalized(text))
    array_distinct(
      when(size(toks) < n, array(concat_ws("", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws("", slice(toks, i + 1, lit(n))))))
  }

  /** Jaccard similarity of two shingle arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** MinHash signature: K permutations approximated by seeded xxhash64.
    * sig[i] = min over shingles of xxhash64(shingle, i). Pr[sig_a[i] ==
    * sig_b[i]] = J(a,b) — the standard estimator (Broder '97).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(s, i))))

  /** Banded LSH keys from a minhash signature: one 64-bit key per band of
    * `rowsPerBand` signature values (band index folded into the key).
    * Docs sharing ≥1 band key become dedup candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))), b))

  /** Estimated Jaccard from two signatures: fraction of agreeing slots. */
  def minhashEstimate(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast("double") / size(sigA).cast("double")

  /** SimHash-64 over token arrays: per-token 64-bit hash, bitwise majority
    * vote. Near-duplicate docs differ in few bits (Charikar '02 /
    * Manku et al. '07). Built from higher-order functions: for each bit,
    * count tokens with that bit set vs total.
    */
  def simhash64(toks: Column): Column = {
    val hs = transform(toks, t => xxhash64(t))
    val n = size(hs)
    // bit i of result = 1 iff #tokens with bit i set > n/2
    (0 until 64).map { i =>
      val ones = size(filter(hs, h => shiftright(h, i).bitwiseAND(1L) === 1L))
      when(ones * 2 > n, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Dot product of two double arrays — explicit sequential fold so the
    * DuckDB oracle (list_dot_product) and Spark agree bit-for-bit.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(‖a‖·‖b‖) in doubles. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
