package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/sketch primitives for the dedup + similarity operators.
  *
  * Everything here is built from codegen'd Spark SQL functions (no Scala
  * UDFs) so the expressions stay inside whole-stage codegen and the sketches
  * are computed scan-side, before any shuffle.
  */
object Text {

  /** Whitespace tokens, empties dropped (single-space split — matches the
    * DuckDB oracle's `string_split(text, ' ')` + filter semantics exactly).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= lit(""))

  /** Distinct n-token shingles, space-joined. (The short-doc guard matters:
    * `sequence(1, 0)` in Spark counts DOWN, it is not empty.)
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))

  /** MinHash signature: k 64-bit min-hashes over the shingle set. Hash i of
    * shingle s = xxhash64(s, i) — one base hash family indexed by the lane,
    * the standard Spark idiom (MinHashLSH in Spark MLlib uses the same
    * perturbed-hash construction).
    */
  def minhash(shingleCol: Column, k: Int): Column =
    transform(
      sequence(lit(0L), lit((k - 1).toLong)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** LSH band keys: hash of each r-lane band of the signature; a candidate
    * pair shares ≥1 band key. bands * r must equal the signature length.
    *
    * Native kernel ([[graft.functions.BandKeys]]): the HOF spelling
    * ([[bandsHof]]) re-evaluates the `sig` argument expression once per
    * band inside the interpreted lambda — ×numBands the whole minhash
    * chain wherever the signature is not already a bound column (the
    * streaming band indexes, the funnel gates). Values are identical
    * (NativeExprSpec pins element-for-element equality, null sig
    * included). Callers must have graft functions registered — every
    * operator entry point calls [[GraftFunctions.register]].
    */
  def bands(sig: Column, numBands: Int, r: Int): Column =
    call_function("graft_bands", sig, lit(numBands), lit(r))

  /** The HOF spelling of [[bands]] — kept as the executable spec the
    * native kernel is asserted against (NativeExprSpec), never on a hot
    * path.
    */
  def bandsHof(sig: Column, numBands: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(sig, b * lit(r) + lit(1), lit(r)), b))

  /** ±1 per bit of a 64-bit hash, statically unrolled (shift amounts must be
    * literals for `shiftright`).
    */
  private def bitSigns(h: Column): Column =
    array((0 until 64).map { j =>
      when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1))
    }: _*)

  /** Column mirror of [[GraftFunctions.portableTokenHash]] (the simhash
    * token-hash family): two prime-mod polynomial rolls over the codepoints,
    * each scrambled to 32 bits, packed low|high. Used only as the spec-side
    * cross-check of the native kernel; the per-char HOF chain is too slow
    * for hot paths.
    */
  private def polyFold(tok: Column, base: Long, mod: Long): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)), i => ascii(tok.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(base) + c) % lit(mod))

  def portableTokenHash(tok: Column): Column = {
    val h1 = (polyFold(tok, 31L, 1000000007L) * lit(2654435761L) + lit(40503L)) % lit(4294967296L)
    val h2 = (polyFold(tok, 131L, 998244353L) * lit(2246822519L) + lit(3266489917L)) % lit(4294967296L)
    h1.bitwiseOR(shiftleft(h2, 32))
  }

  /** 64-bit SimHash over a token array: bit j is the sign of
    * Σ_tokens (bit j of portableTokenHash(token) ? +1 : -1).
    */
  def simhash(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, bitSigns(portableTokenHash(t)), (a, b) => a + b))
    val masks = array((0 until 64).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** The 16-bit chunks of a 64-bit sketch (pigeonhole blocking: hamming ≤ 3
    * ⇒ at least one of 4 chunks identical).
    */
  def chunks16(h: Column): Column =
    array((0 until 4).map(i => shiftright(h, i * 16).bitwiseAND(lit(0xFFFFL))): _*)
}
