package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression net: the scale properties the flagship queries
  * are designed around (SCALE.md / PLANS.md) asserted against the actual
  * physical plans, so a refactor that silently reintroduces a cartesian
  * product, loses parquet filter pushdown, or stops pruning columns
  * fails CI instead of surfacing as a 100x regression on a real cluster.
  *
  * Planning only — `executedPlan` is inspected, no query is executed
  * (index-backed entries build their memoized models once, at sf0.001).
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // formatted explain descends into the AQE wrapper, where a collect on
  // executedPlan stops at AdaptiveSparkPlanExec and misses the scans
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  // The dedup / search / corpus families must never pair rows outside an
  // equi-join: a CartesianProduct over corpus-sized inputs is the one
  // plan shape that cannot survive a 100x scale-up. (1-row broadcast
  // crosses plan as BroadcastNestedLoopJoin over a single-row side and
  // are fine — only true cartesian products are banned.)
  private val noCartesian = Seq(
    "q_dedup_exact", "q_dedup_ngram_jaccard", "q_dedup_containment",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash", "q_dedup_spans", "q_dedup_scrub_spans",
    "q_source_kl",
    "q_dedup_embedding_tight", "q_dedup_semantic",
    "q_dedup_incremental", "q_dedup_incremental_bucketed",
    "q_dedup_components", "q_dedup_cluster_sizes",
    "q_dedup_keep_best",
    "q_decontaminate", "q_decontaminate_bloom",
    "q_ann_ivf", "q_ann_gann", "q_ann_pq", "q_ann_ivfpq", "q_ann_bq",
    "q_ann_ivfbq", "q_ann_sq", "q_ann_ivfsq", "q_knn_join", "q_pmi_bigrams",
    "q_zorder_key", "q_pack_sequences", "q_pack_chunks",
    "q_quality_percentile_filter", "q_tfidf_top_terms",
    "q_sparse_search", "q_bm25_search", "q_ngram_novelty",
    "q_unigram_entropy", "q_budget_select", "q_hybrid_rrf",
    "q_knn_grouped", "q_corpus_delta", "q_domain_cap", "q_join_skew",
    "q_dedup_winnow")

  // The round-10 rule that retired the engine's last single-task-per-
  // group shapes: any window that orders corpus rows (doc_id in its
  // spec) must carry the doc-block shard key, so its groups are bounded
  // by blockDocs regardless of corpus size. Lang-only windows remain
  // legal over aggregate-sized inputs (score histograms, shard bases).
  for (name <- Seq("q_pack_sequences", "q_pack_chunks",
      "q_quality_percentile_filter"))
    test(s"$name: doc-ordered windows carry the block-shard key") {
      val docWindows = plan(name).linesIterator.filter(l =>
        l.contains("windowspecdefinition") && l.contains("doc_id")).toSeq
      assert(docWindows.nonEmpty, "no doc-ordered window found")
      docWindows.foreach(l =>
        assert(l.contains("_shard"), s"unbounded corpus window: $l"))
    }

  test("q_domain_cap: the per-source cap is the bounded-heap aggregate, " +
      "not a corpus rank window") {
    // A row_number window partitioned by source sorts EVERY document of
    // every source (the hot domain the cap exists for becomes the
    // straggler); the TopKAgg form partial-aggregates map-side and ships
    // at most k pairs per (source, partition). Pin both halves: the heap
    // aggregate runs in partial mode, and no window remains in the plan.
    val p = plan("q_domain_cap")
    assert(p.contains("partial_graft_top_k"),
      "expected a map-side partial graft_top_k aggregate")
    assert(!p.toLowerCase.contains("windowspecdefinition"),
      "q_domain_cap must not fall back to a rank window")
  }

  test("q_join_skew: both aggregates are map-side combined — partial " +
      "per-key counts, partial histogram") {
    val p = plan("q_join_skew")
    assert(p.linesIterator.count(_.contains("partial_count")) >= 2,
      "expected partial (map-side) aggregation at both stages")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sample_exact_k: the rank filter partial-limits BEFORE the exchange") {
    // map-side WindowGroupLimit caps per-partition state at k rows per
    // stratum — the property that lets the slice builder run over a
    // 100 TB stratum without materializing it into one window sort
    val p = plan("q_sample_exact_k")
    // two WindowGroupLimit nodes: the map-side partial (below the
    // stratum exchange) and the final one feeding the Window
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"rank-limit pushdown missing:\n$p")
  }

  test("q_corpus_delta: the snapshot join is a shuffled hash/merge join, not broadcast-nested-loop") {
    // both sides are corpus-sized at 100 TB — the plan must pair them
    // with an equi-join on doc_id
    val p = plan("q_corpus_delta")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"))
  }

  noCartesian.foreach { name =>
    test(s"$name: no cartesian product in the physical plan") {
      assert(!plan(name).contains("CartesianProduct"))
    }
  }

  test("q_corpus_delta_bucketed: the delta join consumes the bucket " +
      "layout — no hash-partitioning Exchange") {
    val p = plan("q_corpus_delta_bucketed")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed delta join still shuffles:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a co-located merge join:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"scan did not report bucket selection:\n$p")
  }

  test("q_profile_quantiles: no corpus-ordered window — ranks resolve " +
      "against the (lang, n_chars) histogram") {
    // the pre-r11 plan sorted each language's corpus rows in ONE window
    // group (orderBy n_chars, doc_id). The histogram-rank form's windows
    // run over the aggregate only, so no window spec may reference
    // doc_id at all.
    val p = plan("q_profile_quantiles")
    val docWindows = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") && l.contains("doc_id")).toSeq
    assert(docWindows.isEmpty,
      s"corpus-ordered window reintroduced:\n${docWindows.mkString("\n")}")
    // and the corpus aggregation is partial (map-side combine) before
    // its exchange: HashAggregate appears below the shuffle
    assert(p.contains("HashAggregate"), "histogram aggregation missing")
  }

  test("q_dedup_containment: Auto selects the raw posting join on this " +
      "hot-shingle-free corpus — no prefix window, no array payload ships") {
    // round 12 cost-based selection: on the real documents corpus the
    // exact raw-join row count is ≤16 rows/posting, so the sanctioned
    // plan is the bare posting join + pair-count aggregate. A window or
    // an array_intersect here means the entry is paying the prefix
    // insurance premium on a corpus that provably doesn't need it.
    val p = plan("q_dedup_containment")
    assert(!p.linesIterator.exists(_.contains("windowspecdefinition")),
      s"raw containment plan gained a window:\n$p")
    assert(!p.contains("array_intersect"),
      "raw containment plan ships array payloads — count-based verify lost")
    assert(p.contains("HashAggregate"), "pair-count aggregate missing")
  }

  test("containmentJoin: the two sanctioned plans — Raw is window-free " +
      "with count verify; Prefix keeps the df-rank window + exact verify") {
    // forced strategies on a tiny frame: pins BOTH physical shapes the
    // Auto selector may emit, so a refactor can't silently merge them.
    import org.apache.spark.sql.functions._
    import graft.dedup.SetSimJoin
    val df = spark.range(8).select(col("id").as("doc_id"),
      lit("en").as("lang"),
      expr("transform(sequence(1, 6), j -> concat('s', id, '_', j))").as("sh"))
      .withColumn("nsh", size(col("sh")))
    def shape(st: SetSimJoin.Strategy): String =
      SetSimJoin.containmentJoin(df, "doc_id", "lang", "sh", "nsh", 8, 10, st)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val raw = shape(SetSimJoin.Strategy.Raw)
    assert(!raw.contains("windowspecdefinition") &&
      !raw.contains("array_intersect") && !raw.contains("CartesianProduct"),
      s"raw containment shape changed:\n$raw")
    val pre = shape(SetSimJoin.Strategy.Prefix)
    assert(pre.linesIterator.exists(l =>
      l.contains("windowspecdefinition") && l.contains("doc_id")),
      s"prefix containment lost its df-ranking window:\n$pre")
    assert(pre.contains("array_intersect"),
      "prefix containment lost its exact verification step")
    assert(!pre.contains("CartesianProduct"))
  }

  test("q_dedup_incremental_bucketed: the batch-vs-corpus fingerprint " +
      "anti-join reads co-bucketed tables — no Exchange partitions on h") {
    // both fingerprint tables are bucketed by the text hash, so the
    // exact-hash anti-join must carry NO hashpartitioning(h...) Exchange;
    // the near-dup half's (lang, tok) exchanges are its own keys and the
    // presentation orderBy is a range exchange — both allowed.
    val p = plan("q_dedup_incremental_bucketed")
    val hx = p.linesIterator.filter(_.contains("hashpartitioning(h#")).toSeq
    assert(hx.isEmpty,
      s"fingerprint anti-join re-shuffles on h:\n${hx.mkString("\n")}")
  }

  for (name <- Seq("q_budget_select", "q_budget_mixture"))
    test(s"$name: no corpus-ordered window — the cumsum runs over " +
        "the (lang, score_mu) histogram") {
      val p = plan(name)
      val docWindows = p.linesIterator.filter(l =>
        l.contains("windowspecdefinition") && l.contains("doc_id")).toSeq
      assert(docWindows.isEmpty,
        s"corpus-ordered window in budget selection:\n${docWindows.mkString("\n")}")
    }

  test("q_sample_weighted: the k-of-corpus draw is a " +
      "TakeOrderedAndProject, not a full sort") {
    // the A-ES top-k must forward ≤k keyed rows per partition — a Sort
    // exchange here would shuffle the whole corpus for a 100-row sample
    assert(plan("q_sample_weighted").contains("TakeOrderedAndProject"),
      "weighted sample lost its partial-limit shape")
  }

  for (name <- Seq("q_sparse_search", "q_bm25_search"))
    test(s"$name: the global top-10 is a TakeOrderedAndProject, not a full sort") {
      // orderBy+limit must plan as TakeOrderedAndProject so each partition
      // forwards at most 10 scored rows to the driver-side merge — a full
      // Sort exchange here would move every scored doc at 100 TB
      assert(plan(name).contains("TakeOrderedAndProject"),
        "top-k lost its partial-limit shape")
    }

  test("q01: shipdate predicate is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters:") && l.contains("l_shipdate")))
  }

  test("q01: the lineitem scan prunes to the referenced columns") {
    // lineitem has 16 columns; q01 touches 7 — the ReadSchema struct
    // must stay narrow or the scan reads the whole table for nothing
    val rs = plan("q01_pricing_summary").linesIterator
      .find(_.contains("ReadSchema:")).getOrElse(fail("no ReadSchema line"))
    val ncols = rs.substring(rs.indexOf("struct<")).count(_ == ',') + 1
    assert(ncols <= 8, s"lineitem scan reads $ncols columns: $rs")
  }

  test("q06: both range predicates reach the scan") {
    val pushed = plan("q06_forecast_revenue").linesIterator
      .filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount"))
  }
}
