package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis / hashing functions, all native Catalyst expressions.
  *
  * Every hash here is built on `h32` — the first 8 hex chars of md5 parsed
  * base-16 — because md5 is the one hash both Spark and DuckDB compute
  * identically, which makes minhash / simhash / feature-hash embeddings
  * oracle-checkable cross-engine (see the matching SQL builders in
  * graft.queries.Sql).
  */
object TextF {

  /** Lowercased whitespace tokens; empty strings dropped.
    * DuckDB twin: list_filter(regexp_split_to_array(trim(lower(x)),'\s+'), t -> t <> '') */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Deterministic 32-bit cross-engine hash.
    * DuckDB twin: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT). */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic 60-bit cross-engine hash: 15 hex chars of md5 — the
    * widest md5 prefix whose base-16 parse stays POSITIVE in a signed
    * 64-bit lane on both engines (16 chars would overflow DuckDB's
    * BIGINT cast for high-bit values).
    * DuckDB twin: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT). */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Salted variant: h32(salt || x). */
  def h32s(salt: String, c: Column): Column = h32(concat(lit(salt), c))

  /** Word n-gram shingles ("a b c") over a token array; < n tokens → empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct n-gram shingle set (dedup input). */
  def shingleSet(toks: Column, n: Int): Column = array_distinct(shingles(toks, n))

  /** MinHash signature component j over a shingle array: min over shingles
    * of h32("j#" ++ s); empty input → -1. One column per j gives the
    * k-component signature (minhash→band→bucket-join dedup path). */
  def minhash(sh: Column, j: Int): Column =
    coalesce(array_min(transform(sh, s => h32(concat(lit(s"$j#"), s)))), lit(-1L))

  /** LSH band key: md5 over r consecutive signature components. */
  def bandKey(sig: Seq[Column], from: Int, r: Int): Column =
    md5(concat_ws(",", sig.slice(from, from + r).map(_.cast("string")): _*))

  /** Bit j of a long for a LAMBDA-VARIABLE shift amount — the Scala DSL's
    * `shiftright` only accepts a literal Int, so this builds the Catalyst
    * ShiftRight/BitwiseAnd tree directly (exact at ANY bit index; the
    * earlier floor(h/2^j) double formulation was only exact to 53 bits,
    * which capped SimHash at 32 bits).
    * DuckDB twin: (h >> j) & 1. */
  private def bitAt(h: Column, j: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, Literal, ShiftRight}
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(BitwiseAnd(ShiftRight(expression(h), expression(j)), Literal(1L)))
  }

  /** 2^j as a long via integer shift, j a lambda variable.
    * DuckDB twin: (CAST(1 AS BIGINT) << j). */
  private def pow2(j: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, ShiftLeft}
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(ShiftLeft(Literal(1L), expression(j)))
  }

  /** 60-bit SimHash over a token array (term-frequency weighted): bit j is
    * set iff Σ_tokens (2·bit_j(h60(tok)) − 1) > 0, i.e. iff
    * 2·(count of tokens with bit j set) > n_tokens — integer-identical.
    * 60 bits (vs the classic 64) keeps the signature positive in a signed
    * BIGINT on both engines; vs 32 bits it cuts random band-key collisions
    * in the banded dedup join ~128× (15-bit bands vs 8-bit bands).
    *
    * Evaluation shape: ONE h60 (md5) per token, accumulated into a 60-slot
    * bit-count array. The hash must be the per-element lambda VARIABLE of
    * the outer fold — an earlier formulation that looped bits outermost
    * re-inlined the hash subtree per bit (60 md5 calls per token) and made
    * SimHash dedup 37 s at sf0.1. */
  def simhash60(toks: Column): Column = {
    val counts = aggregate(transform(toks, t => h60(t)),
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (v, j) => v + bitAt(h, j)))
    val n = size(toks).cast("long")
    aggregate(zip_with(counts, sequence(lit(0), lit(59)),
        (c, j) => when(c * 2L > n, pow2(j)).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }

  /** Feature-hash bucket (h32(tok) mod dim) and sign (±1 from a salted
    * hash) — the deterministic hash-projection text embedder. */
  def featureBucket(tok: Column, dim: Int): Column = h32(tok) % dim
  def featureSign(tok: Column): Column = lit(2L) * (h32s("s#", tok) % 2) - lit(1L)

  /** Rolling document fingerprint: min h32 over word 3-shingles ("the
    * document fingerprinting (rolling hash)" op); < 3 tokens → -1. */
  def fingerprint(toks: Column): Column =
    coalesce(array_min(transform(shingles(toks, 3), s => h32(s))), lit(-1L))

  /** Count of tokens that appear in a fixed vocabulary list. */
  def hitCount(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))
}
