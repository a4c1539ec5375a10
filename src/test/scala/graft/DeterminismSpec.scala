package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count independence: SCALE.md's global rule — deterministic
  * math (sequential double folds, DECIMAL money sums, md5-derived
  * hashes) means re-partitioning for scale can never change an answer,
  * which is what makes the sf0.01 oracle a valid proxy for cluster
  * runs — asserted empirically. Representative entries from every
  * numeric-risk family (money aggregation, float cosine folds, rank
  * windows, RRF fusion, minhash banding, connected components) run
  * under `spark.sql.shuffle.partitions` = 4 and again = 7 (coprime, so
  * every hash partitioner reassigns rows) and must collect the exact
  * same multiset — cell-for-cell, no tolerance.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private val entries = Seq(
    "q01_pricing_summary", // DECIMAL money sums over group fan-in
    "q_sparse_search",     // sequential-fold tf-idf cosines
    "q_hybrid_rrf",        // two rank lists + RRF fusion
    "q_knn_grouped",       // per-group rank windows on float scores
    "q_dedup_minhash_lsh", // banded signature join + verify
    "q_dedup_components",  // union-find / label propagation keepers
    "q_customer_running_spend", // running-sum window over money
    "q_lm_cross_entropy",  // ln-term fold over per-doc bigram lists
    "q_dedup_semantic",    // centroid argmin + in-cluster cosine verify
    "q_quality_percentile_filter", // per-language exact-rank cut (r9)
    "q_dedup_keep_best",   // cluster argmax keeper over components (r9)
    "q_dsir_weights",      // ln-ratio fold over hashed buckets (r9)
    "q_heavy_hitters",     // CMS candidate filter + exact count (r9)
    "q_corpus_delta",      // full-outer fingerprint classification (r9)
    "q_events_outliers",   // exact median/MAD rank selection (r9)
    "q_sample_exact_k",    // salted-hash rank windows (r9)
    "q_pack_chunks",       // two-phase prefix offsets + chunk explode
    "q_pack_sequences",    // two-phase prefix offsets + bin assign (r10)
    "q_pagerank",          // integer-picos power iteration (r10)
    "q_fastrp_embed",      // integer-micros A·X message passing (r10)
    "q_bpe_merges",        // per-round integer argmax merges (r10)
    "q_bpe_encode",        // vocab-join piece counts under trained merges (r11)
    "q_bm25_search",       // integer-micros BM25 fold + top-10 (r11)
    "q_ngram_novelty",     // min-doc_id first-occurrence attribution (r11)
    "q_unigram_entropy",   // integer-micros entropy fold (r11)
    "q_budget_select",     // histogram-cumsum token-budget threshold (r11)
    "q_dedup_containment", // df-ranked prefix + exact verify (r11)
    "q_profile_quantiles", // histogram-rank quantile selection (r11)
    "q_multimodal_embed",  // float folds + integer-micros lift (r11)
    "q_dedup_scrub_spans", // keeper argmin + collect_set coverage (r12)
    "q_source_kl",         // integer-micros KL fold per source (r12)
    "q_sample_weighted",   // hash-u A-ES top-k priority sample (r12)
    "q_domain_cap",        // bounded-heap per-source top-k (r12)
    "q_join_skew",         // count-of-counts bit-width histogram (r12)
    "q_curation_funnel",   // per-stage yield sums over flag columns (r12)
    "q_doc_winnow",        // window-min fingerprint selection (r12)
    "q_dedup_winnow",      // fp posting join + shared-count filter (r12)
    "q_vocab_growth")      // vocab-sized min-doc aggregate + bucket cumsum (r12)

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  entries.foreach { name =>
    test(s"$name: identical results at shuffle.partitions 4 vs 7") {
      val key = "spark.sql.shuffle.partitions"
      val before = spark.conf.get(key)
      try {
        spark.conf.set(key, "4")
        graft.core.Caches.clear(spark)
        val a = rows(name)
        spark.conf.set(key, "7")
        graft.core.Caches.clear(spark)
        val b = rows(name)
        assert(a == b, s"$name diverged across partition counts")
        assert(a.nonEmpty)
      } finally {
        spark.conf.set(key, before)
        graft.core.Caches.clear(spark)
      }
    }
  }
}
