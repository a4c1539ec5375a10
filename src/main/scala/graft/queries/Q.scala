package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark implementation plus (when the op is
  * SQL-expressible) a DuckDB oracle that must hash-match it on the same
  * parquet tables. `oracle = None` → the driver records a rows-only check
  * (approximate ops: ANN, LSH-bucketed candidates, FastRP, ...).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Shared DuckDB SQL fragments, mirroring graft.functions.{TextF, VectorF}
  * exactly — same fold order, same hash, same decimal casts — so Spark and
  * DuckDB produce bit-identical values.
  */
object Sql {
  /** Whitespace tokens of lowercased text (TextF.tokens twin). */
  def toks(col: String = "text"): String =
    s"list_filter(regexp_split_to_array(trim(lower($col)), '\\s+'), t -> t <> '')"

  /** TextF.h32 twin. */
  def h32(x: String): String = s"CAST('0x' || substr(md5($x), 1, 8) AS BIGINT)"

  /** TextF.h60 twin (15 hex chars — stays positive in BIGINT). */
  def h60(x: String): String = s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** Exact decimal sum surfaced as double (deterministic across engines,
    * unlike a partition-order-dependent double sum). */
  def dsum(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** TPC-H revenue term extendedprice·(1−discount), exact decimal. */
  val discPrice: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))"

  def dsumExpr(x: String): String = s"CAST(sum($x) AS DOUBLE)"

  /** Sequential-fold double dot product of two list columns (VectorF.dot
    * twin; relies on both engines folding the element products in list
    * order). */
  def dotd(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def norm(a: String): String = s"sqrt(${dotd(a, a)})"

  /** Sequential-fold L2 distance of two list columns (VectorF.l2Dist
    * twin: per-element ::DOUBLE, fold in list order). */
  def l2(a: String, b: String): String =
    s"sqrt(list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"

  def cosine(a: String, b: String): String =
    s"(${dotd(a, b)} / (${norm(a)} * ${norm(b)}))"

  /** 3-shingle list over a token list t (TextF.shingles twin). */
  def shingles3(t: String): String =
    s"list_transform(range(1, greatest(len($t) - 1, 1)), i -> concat_ws(' ', $t[i], $t[i+1], $t[i+2]))"

  /** 2-shingle (bigram) list over a token list t (TextF.shingles n=2
    * twin: empty below 2 tokens, len−1 bigrams otherwise). */
  def shingles2(t: String): String =
    s"list_transform(range(1, greatest(len($t), 1)), i -> concat_ws(' ', $t[i], $t[i+1]))"

  /** Corpus.lmCrossEntropy twin: the bigram-LM `scored` + `folded` CTEs
    * (integer-micros fold — ln rounded to 6 dp, lifted to exact BIGINT
    * micros, summed order-independently). Expects CTEs `dbg(doc_id, bg,
    * cnt)`, `c12(bg, c12)`, `uni(w, c1)`, `v(v)` in scope; yields
    * `folded(doc_id, nll_mu, n)` with cross-entropy =
    * round(-nll_mu/1e6/n, 6). */
  val lmFold: String =
    """scored AS (
      |  SELECT doc_id, cnt,
      |    CAST(round(round(ln((c12 + 1)::DOUBLE / (c1 + v)), 6) * 1000000, 0)
      |      AS BIGINT) AS lnp_mu
      |  FROM dbg JOIN c12 USING (bg)
      |  JOIN uni ON uni.w = split_part(bg, ' ', 1)
      |  CROSS JOIN v),
      |folded AS (
      |  SELECT doc_id, CAST(sum(cnt * lnp_mu) AS BIGINT) AS nll_mu,
      |    CAST(sum(cnt) AS BIGINT) AS n
      |  FROM scored GROUP BY doc_id)""".stripMargin

  /** The folded → cross-entropy projection matching lmCrossEntropy's
    * final divisions (same operation order on both engines). */
  val lmEntropy: String = "round(-nll_mu::DOUBLE / 1000000.0 / n, 6)"

  /** TextF.minhash twin over a shingle list. */
  def minhash(sh: String, j: Int): String =
    s"coalesce(list_min(list_transform($sh, s -> ${h32(s"'$j#' || s")})), -1)"

  /** TextF.simhash60 twin over a token list (integer shifts — exact at
    * every bit index, where the old floor(h/2^j) double form capped the
    * signature at 53 usable bits). */
  def simhash60(t: String): String = {
    val hs = s"list_transform($t, tk -> ${h60("tk")})"
    s"""CAST(list_sum(list_transform(range(0, 60), j ->
       |  CASE WHEN list_sum(list_transform($hs,
       |         h -> 2 * ((h >> j) & 1) - 1)) > 0
       |       THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT)""".stripMargin
  }
}
