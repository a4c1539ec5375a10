package graft.queries

import graft.core.Tables
import graft.functions.TextF
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector similarity search: a query string against the tf-idf
  * postings of the `documents` corpus, top-10 by cosine — the sparse
  * search surface the reference maps to Milvus sparse fields
  * (radient/tasks/sinks/milvus.py:74-76) and sketches on the sklearn
  * vectorizer path (radient/tasks/vectorizers/text/sklearn.py:27-28,
  * "sparse vectors coming soon"). The MLlib `TfIdf.topK` twin of this
  * query is spec-only (TfIdfSpec); this entry is the oracle-checked form.
  *
  * Exactness: weights are the rational tf·(N/df) of q_tfidf_top_terms
  * (one IEEE multiply + divide — `ln` is not bit-reproducible across
  * engines), and every float reduction (query·doc dot, both L2 norms)
  * is a sequential fold in token order on BOTH engines: Spark folds
  * `sort_array(collect_list(struct(tok, …)))`, DuckDB `list_sum` over
  * `list(… ORDER BY tok)` — same element order, same IEEE op sequence,
  * bit-identical cosines.
  *
  * Scale shape: the corpus side is two hash aggregates (tf, df) + a
  * broadcast 1-row count; the query side is a handful of rows broadcast
  * into the postings join, so the only data-sized shuffles are the
  * tf/df aggregations and the per-doc fold. The global top-10 is an
  * orderBy+limit → TakeOrderedAndProject, so at 100 TB each partition
  * forwards at most 10 candidate rows to the driver-side merge.
  */
object SparseSearch {

  /** The literal search string; tokenized with the engine's tokenizer at
    * plan-build time (driver-side scalar prep, like TfIdf.topK embedding
    * its query string). "hash" appears twice → exercises query tf > 1. */
  val QUERY = "hash join hash scan spark"

  private[graft] def queryTf: Seq[(String, Long)] =
    QUERY.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy(_._1)

  val q_sparse_search = Q(
    "q_sparse_search",
    (s, dir) => {
      import s.implicits._
      // fit-once postings (memoized per app+dataset — see Postings):
      // repeat searches read the cached inverted index, not a refit
      val p = Postings(s, dir)
      val (dfreq, n) = (p.dfreq, p.n)
      // cached corpus state: weights postings + per-doc L2 norms (folded
      // in tok order — see Postings.dnorm); only the query-side frames
      // below are built per search
      val w = p.w
      val dnorm = p.dnorm
      // query vector: same weighting over the query's term frequencies;
      // out-of-vocabulary terms drop in the dfreq inner join (df undefined)
      val qw = queryTf.toDF("tok", "qtf")
        .join(dfreq, Seq("tok")).crossJoin(broadcast(n))
        .withColumn("qw", (col("qtf") * col("n")).cast("double") / col("df"))
        .select(col("tok"), col("qw"))
      val qnorm = qw
        .agg(sort_array(collect_list(struct(col("tok"), col("qw")))).as("ws"))
        .select(sqrt(aggregate(col("ws"), lit(0.0),
          (a, p) => a + p.getField("qw") * p.getField("qw"))).as("qnorm"))
      // sparse dot = postings equi-join on tok (query side broadcast)
      val dots = w.join(broadcast(qw), Seq("tok"))
        .select(col("doc_id"), col("tok"), (col("w") * col("qw")).as("term"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("tok"), col("term")))).as("ts"))
        .select(col("doc_id"),
          aggregate(col("ts"), lit(0.0),
            (a, p) => a + p.getField("term")).as("dot"))
      val rankOrder = Seq(desc("cos_sim"), col("doc_id").asc)
      // global top-10 via orderBy+limit → TakeOrderedAndProject (each
      // partition forwards only its local top-10; InferWindowGroupLimit
      // does not fire on an un-partitioned window, so a rank filter here
      // would sort-exchange every scored doc to one partition). The rank
      // window then runs over just the 10 survivors — same total order,
      // so the ranks equal the global ones.
      val top = dots.join(dnorm, Seq("doc_id")).crossJoin(broadcast(qnorm))
        .withColumn("cos_sim",
          round(col("dot") / (col("dnorm") * col("qnorm")), 6))
        .orderBy(rankOrder: _*).limit(10)
      top
        .withColumn("rnk",
          row_number().over(Window.orderBy(rankOrder: _*)).cast("long"))
        .select(col("doc_id"), col("cos_sim"), col("rnk"))
        .orderBy(col("rnk"))
    },
    Some {
      val qVals = queryTf.map { case (t, c) => s"('$t', $c)" }.mkString(", ")
      s"""
      |WITH t AS (SELECT doc_id, unnest(${Sql.toks()}) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT count(*) AS n FROM documents),
      |w AS (SELECT doc_id, tok, CAST(tf * n AS DOUBLE) / df AS w
      |      FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
      |dnorm AS (SELECT doc_id, sqrt(list_sum(list(w * w ORDER BY tok))) AS dnorm
      |          FROM w GROUP BY doc_id),
      |q(tok, qtf) AS (VALUES $qVals),
      |qw AS (SELECT tok, CAST(qtf * n AS DOUBLE) / df AS qw
      |       FROM q JOIN dfreq USING (tok) CROSS JOIN n),
      |qn AS (SELECT sqrt(list_sum(list(qw * qw ORDER BY tok))) AS qnorm FROM qw),
      |dots AS (SELECT doc_id, list_sum(list(w * qw ORDER BY tok)) AS dot
      |         FROM w JOIN qw USING (tok) GROUP BY doc_id)
      |SELECT doc_id, cos_sim, rnk FROM (
      |  SELECT doc_id, round(dot / (dnorm * qnorm), 6) AS cos_sim,
      |    row_number() OVER (ORDER BY round(dot / (dnorm * qnorm), 6) DESC,
      |                       doc_id) AS rnk
      |  FROM dots JOIN dnorm USING (doc_id) CROSS JOIN qn)
      |WHERE rnk <= 10
      |ORDER BY rnk
      |""".stripMargin
    })

  /** Okapi BM25 top-10 for the same query string — the ranking function
    * real sparse retrieval runs (Lucene/Elasticsearch default, and the
    * sparse half of every BM25+dense hybrid stack), complementing the
    * tf-idf cosine entry above: BM25 adds document-length normalization
    * (b = 0.75) and term-frequency saturation (k1 = 1.2), so a doc can't
    * win by repeating one query term or by simply being long.
    *
    * Exactness: idf's `ln` is the one non-bit-reproducible step, so the
    * whole per-(doc, term) contribution follows the integer-micros fold
    * discipline ([[Sql.lmFold]] precedent): every +,−,×,÷ in the term is
    * written in the IDENTICAL operation order on both engines over
    * integer tf/df/dl and double constants (bit-identical), the single
    * ln-bearing product rounds to 6 dp and lifts to BIGINT micros, and
    * the per-doc score is an order-independent INTEGER sum weighted by
    * integer query-term multiplicity. Output is score_mu (micros) —
    * never divided back, so no final-rounding hazard.
    *
    * Scale shape: rides the memoized [[Postings]] tf/dfreq caches (no
    * refit per search); dl is one per-doc integer aggregate; avgdl and
    * the query terms broadcast as 1-row / 4-row frames into the postings
    * join, which the `tok IN (query)` semi-filter prunes BEFORE the dl
    * join — only postings of query terms (a few hundred rows regardless
    * of corpus size) reach the join/fold; the global top-10 is
    * orderBy+limit → TakeOrderedAndProject, ≤10 rows per partition to
    * the driver merge. */
  val q_bm25_search = Q(
    "q_bm25_search",
    (s, dir) => {
      import s.implicits._
      val p = Postings(s, dir)
      // per-doc length in tokens, and the corpus mean length (1-row)
      val dl = p.tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val avgdl = dl.agg(sum(col("dl")).as("tot")).crossJoin(broadcast(p.n))
        .select((col("tot").cast("double") / col("n")).as("avgdl"))
      val qdf = queryTf.toDF("tok", "qtf")
      // Lucene-style BM25: idf = ln((N - df + 0.5)/(df + 0.5) + 1),
      // tf saturation k1 = 1.2, length normalization b = 0.75. Every
      // sub-expression mirrors the oracle's operation order exactly.
      val idf = log((col("n") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val denom = col("tf") + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))
      val termMu = round(round(idf * (col("tf") * lit(2.2)) / denom, 6)
        * lit(1e6)).cast("long")
      // broadcast the 4-term query into the postings: only query-term
      // postings survive into the dl join and the integer fold
      val scores = p.tf.join(broadcast(qdf), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .join(broadcast(p.dfreq), Seq("tok"))
        .crossJoin(broadcast(p.n)).crossJoin(broadcast(avgdl))
        .select(col("doc_id"), (col("qtf") * termMu).as("mu"))
        .groupBy(col("doc_id")).agg(sum(col("mu")).as("score_mu"))
      val rankOrder = Seq(desc("score_mu"), col("doc_id").asc)
      val top = scores.orderBy(rankOrder: _*).limit(10)
      top.withColumn("rnk",
          row_number().over(Window.orderBy(rankOrder: _*)).cast("long"))
        .select(col("doc_id"), col("score_mu"), col("rnk"))
        .orderBy(col("rnk"))
    },
    Some {
      val qVals = queryTf.map { case (t, c) => s"('$t', $c)" }.mkString(", ")
      s"""
      |WITH t AS (SELECT doc_id, unnest(${Sql.toks()}) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT count(*) AS n FROM documents),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |ad AS (SELECT CAST(sum(dl) AS DOUBLE) / n AS avgdl FROM dl CROSS JOIN n GROUP BY n),
      |q(tok, qtf) AS (VALUES $qVals),
      |terms AS (
      |  SELECT doc_id, qtf * CAST(round(round(
      |      ln((n - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
      |        * (tf * 2.2::DOUBLE)
      |        / (tf + 1.2::DOUBLE *
      |           (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * dl / avgdl)),
      |      6) * 1000000, 0) AS BIGINT) AS mu
      |  FROM tf JOIN q USING (tok) JOIN dfreq USING (tok) JOIN dl USING (doc_id)
      |  CROSS JOIN n CROSS JOIN ad),
      |scores AS (SELECT doc_id, CAST(sum(mu) AS BIGINT) AS score_mu
      |           FROM terms GROUP BY doc_id)
      |SELECT doc_id, score_mu, rnk FROM (
      |  SELECT doc_id, score_mu,
      |    row_number() OVER (ORDER BY score_mu DESC, doc_id) AS rnk
      |  FROM scores)
      |WHERE rnk <= 10
      |ORDER BY rnk
      |""".stripMargin
    })

  val all: Seq[Q] = Seq(q_sparse_search, q_bm25_search)
}
