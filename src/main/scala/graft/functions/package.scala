package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft's column-function library.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (higher-order functions over arrays, hash functions), so it is
  * whole-stage-codegen'd, shuffle-free, and runs at parquet-scan
  * speed — no UDFs, no serialization boundary. These are the scalar
  * building blocks for the dedup / similarity / text operators
  * (SURVEY.md §2c).
  */
package object functions {

  // ------------------------------------------------------------------
  // Tokenization / shingling
  // ------------------------------------------------------------------

  /** Whitespace tokens of a text column. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexer tokens: letter runs, digit runs, single symbols. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles (empty array when fewer than n
    * tokens). Space-joined, so shingles are plain strings.
    */
  def wordShingles(tokens: Column, n: Int): Column = {
    // guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so short
    // arrays must short-circuit to an empty shingle set
    val grams = transform(
      sequence(lit(1), size(tokens) - (n - 1)),
      i => concat_ws(" ", slice(tokens, i, lit(n))))
    when(size(tokens) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  // ------------------------------------------------------------------
  // Hashing / sketches (per-row, zero shuffle)
  // ------------------------------------------------------------------

  /** (h1, h2) hash pairs for the Kirsch-Mitzenmacher two-hash MinHash
    * family: each element is hashed exactly TWICE regardless of
    * signature length. Reduced mod 2^31 so `h1 + k*h2` can never
    * overflow a long under ANSI mode. Materialize this in its own
    * projection so the signature lambdas reference a computed
    * attribute instead of re-hashing per signature slot.
    */
  def minhashHashPairs(shingles: Column): Column = {
    val M31 = lit(2147483647L)
    transform(shingles, s =>
      struct(pmod(xxhash64(s), M31).as("h1"), pmod(xxhash64(s, lit(7)), M31).as("h2")))
  }

  /** MinHash signature from (h1, h2) pairs: sig_i = min over elements
    * of h1 + (i+1)*h2.
    *
    * Transposed into ONE aggregate pass whose state is the whole
    * signature array — the per-element hashing runs exactly once.
    * (The naive "one aggregate per slot" form re-evaluates the hash
    * transform per slot: CollapseProject inlines staged projections
    * back into every consumer, so staging does not protect it.)
    */
  def minhashOfPairs(hashed: Column, numHashes: Int): Column =
    aggregate(hashed,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc, sequence(lit(1), lit(numHashes)), (m, i) =>
        least(m, h.getField("h1") + i * h.getField("h2"))))

  /** Convenience single-expression MinHash signature. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    minhashOfPairs(minhashHashPairs(shingles), numHashes)

  /** Element hashes for SimHash; materialize in its own projection. */
  def tokenHashes(tokens: Column): Column = transform(tokens, t => xxhash64(t))

  /** 64-bit SimHash from token hashes: bit j is set when the majority
    * of tokens have bit j set. Transposed like `minhashOfPairs`: one
    * aggregate pass accumulating all 64 bit-vote counters, so each
    * token hash is consumed once.
    */
  def simhashOfHashes(hashes: Column): Column = {
    val n = size(hashes)
    val votes = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)), (v, j) =>
        v + call_function("shiftright", h, j).bitwiseAND(lit(1L))))
    val bits = zip_with(votes, sequence(lit(0), lit(63)), (v, j) =>
      when(v * 2 > n, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Convenience single-expression SimHash. */
  def simhash64(tokens: Column): Column = simhashOfHashes(tokenHashes(tokens))

  /** Polynomial rolling hash of a token sequence (order-sensitive).
    * Computed mod 2^31-1 so every intermediate fits in 63 bits —
    * ANSI-mode safe (no silent wraparound, no overflow error).
    */
  def rollingHash(tokens: Column): Column = {
    val M = lit(2147483647L) // 2^31 - 1
    aggregate(tokens, lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(xxhash64(t), M), M))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------------------
  // Vector math over array<float>/array<double> embeddings
  // ------------------------------------------------------------------

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two numeric arrays (computed in double). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosineSim(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, 0.0).otherwise(dotProduct(a, b) / denom)
  }

  /** Sign-bit LSH bucket for a vector: `numPlanes` pseudo-random
    * hyperplanes with deterministic ±1 components derived from
    * `xxhash64(plane, dim)`. Vectors with small cosine distance land
    * in the same bucket with high probability.
    */
  def hyperplaneBucket(v: Column, numPlanes: Int): Column = {
    val dims = sequence(lit(0), size(v) - 1)
    val bits = transform(sequence(lit(0), lit(numPlanes - 1)), p => {
      val proj = aggregate(
        zip_with(asDouble(v), dims, (x, i) =>
          x * when(xxhash64(p, i).bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
  }
}
