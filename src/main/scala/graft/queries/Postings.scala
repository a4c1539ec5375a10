package graft.queries

import graft.core.{Caches, Tables}
import graft.functions.TextF
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Memoized tf / document-frequency postings of the `documents` corpus —
  * the fitted state of the sparse text vectorizer (the reference fits its
  * CountVectorizer once and reuses it per item,
  * radient/tasks/vectorizers/text/sklearn.py:17-28; Milvus sparse fields
  * are likewise write-once search-many, tasks/sinks/milvus.py:74-76).
  *
  * Per (application, dataset): `tf` (doc_id, tok, tf) and `dfreq`
  * (tok, df) are built by one tokenize + two hash aggregates, cached and
  * tracked in [[Caches]]; every tf-idf-family query entry
  * (q_sparse_search, q_tfidf_top_terms, q_rare_tokens, q_zipf) reads the
  * same cached postings, so repeated searches measure steady-state
  * lookups, not refits — exactly like the memoized index models in
  * [[Ann]]. `Caches.clear` evicts the memo entry along with the frames.
  *
  * At 100 TB the postings are a materialized table (the inverted-index
  * layout every sparse search engine persists); the cache here plays
  * that role in a long-lived session.
  */
private[queries] object Postings {

  /** tf: (doc_id, tok, tf); dfreq: (tok, df); n: 1-row corpus count;
    * w: (doc_id, tok, w) rational tf·(N/df) weights; dnorm: (doc_id,
    * dnorm) L2 norm of each doc's full tf-idf vector, folded in token
    * order (the bit-reproducible fold q_sparse_search's oracle states). */
  final case class P(tf: DataFrame, dfreq: DataFrame, n: DataFrame,
      w: DataFrame, dnorm: DataFrame)

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, P]()

  def apply(s: SparkSession, dir: String): P =
    Caches.memoized(s, dir, memo) {
      val docs = Tables.spread(Tables(s, dir, "documents"))
      val tf = Caches.cached(docs
        .select(col("doc_id"), explode(TextF.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf")))
      val dfreq = Caches.cached(
        tf.groupBy(col("tok")).agg(count(lit(1)).as("df")))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Caches.cached(tf.join(dfreq, Seq("tok")).crossJoin(broadcast(n))
        .withColumn("w", (col("tf") * col("n")).cast("double") / col("df"))
        .select(col("doc_id"), col("tok"), col("w")))
      val dnorm = Caches.cached(w.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("tok"), col("w")))).as("ws"))
        .select(col("doc_id"),
          sqrt(aggregate(col("ws"), lit(0.0),
            (a, p) => a + p.getField("w") * p.getField("w"))).as("dnorm")))
      P(tf, dfreq, n, w, dnorm)
    }
}
