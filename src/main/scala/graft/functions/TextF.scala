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

  /** Canonical stopword list shared by the quality operators
    * (TextAnalysis.q_text_quality / q_corpus_filter, the registry's
    * quality_filter transform). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "is", "to", "in", "it", "on", "for")

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

  /** Full k-component MinHash signature as one array column, backed by
    * the codegen'd [[MinHashK]] kernel — component j equals
    * `minhash(sh, j)` exactly (TextFSpec pins the equivalence); one tight
    * loop instead of k HOF folds re-walking the shingle array. */
  def minhashK(sh: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashK(ColumnBridge.expression(sh), k))
  }

  /** LSH band key: md5 over r consecutive signature components. */
  def bandKey(sig: Seq[Column], from: Int, r: Int): Column =
    md5(concat_ws(",", sig.slice(from, from + r).map(_.cast("string")): _*))

  /** 60-bit SimHash over a token array (term-frequency weighted): bit j is
    * set iff Σ_tokens (2·bit_j(h60(tok)) − 1) > 0, i.e. iff
    * 2·(count of tokens with bit j set) > n_tokens — integer-identical.
    * 60 bits (vs the classic 64) keeps the signature positive in a signed
    * BIGINT on both engines; vs 32 bits it cuts random band-key collisions
    * in the banded dedup join ~128× (15-bit bands vs 8-bit bands).
    *
    * Backed by the codegen'd [[SimHash60]] expression: one md5 + one
    * 60-bit register tally per token in a primitive loop. (The HOF
    * formulation this replaced — aggregate over transform(toks, h60) with
    * a 60-slot zip_with tally — is semantically identical but paid
    * per-element lambda dispatch for every (token, bit) pair;
    * TextFSpec pins the closed-form value so the kernels can't drift.) */
  def simhash60(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash60(ColumnBridge.expression(toks)))
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
