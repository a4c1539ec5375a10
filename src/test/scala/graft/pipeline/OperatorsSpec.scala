package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** make_operator parity: every family constructs by (family, name) string
  * keys, unknown keys fail fast, and a registry-built pipeline runs end to
  * end through Workflow with extra_vars overriding construction params.
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("all four families construct by string key") {
    for ((family, name) <- Seq(
        "source" -> "parquet", "transform" -> "doc_chunk",
        "vectorizer" -> "hash_embed", "sink" -> "parquet")) {
      assert(Operators.make(spark, family, name) != null)
    }
  }

  test("unknown family and unknown name fail fast with the inventory") {
    val e1 = intercept[IllegalArgumentException] {
      Operators.make(spark, "mixer", "x")
    }
    assert(e1.getMessage.contains("unknown operator family"))
    val e2 = intercept[IllegalArgumentException] {
      Operators.make(spark, "vectorizer", "nope")
    }
    assert(e2.getMessage.contains("hash_embed"))
  }

  test("registry-built pipeline runs end to end through Workflow") {
    val out = tmp("ops-e2e")
    val result = new Workflow()
      .addWithParams("read", Operators.make(spark, "source", "parquet",
        Map("path" -> s"${TestSpark.sf0001}/documents.parquet")))
      .addWithParams("chunk", Operators.make(spark, "transform", "doc_chunk",
        Map("chunkTokens" -> "16")))
      .addWithParams("embed", Operators.make(spark, "vectorizer", "hash_embed",
        Map("textCol" -> "chunk_text", "dim" -> "8")))
      .addWithParams("store", Operators.make(spark, "sink", "vector_table",
        Map("path" -> out, "idCol" -> "doc_id", "vecCol" -> "embedding")))
      .execute()
    assert(result.count() > 500, "chunk fan-out should exceed the doc count")
    assert(result.columns.contains("norm_sq"), "vector_table stamps norm_sq")
    val dim = result.select(size(col("embedding"))).head.getInt(0)
    assert(dim == 8)
  }

  test("execute-time extra_vars override construction params") {
    val wf = new Workflow()
      .addWithParams("read", Operators.make(spark, "source", "parquet",
        Map("path" -> s"${TestSpark.sf0001}/documents.parquet")))
      .addWithParams("chunk", Operators.make(spark, "transform", "doc_chunk",
        Map("chunkTokens" -> "1000")))
    val coarse = wf.execute().count()
    val fine = wf.execute(
      Map("chunk" -> Map("chunkTokens" -> "8"))).count()
    assert(fine > coarse, "smaller runtime chunk size must fan out more rows")
  }

  test("tfidf vectorizer and parquet sink round-trip") {
    val out = tmp("ops-tfidf")
    val result = new Workflow()
      .addWithParams("read", Operators.make(spark, "source", "parquet",
        Map("path" -> s"${TestSpark.sf0001}/documents.parquet")))
      .addWithParams("vec", Operators.make(spark, "vectorizer", "tfidf",
        Map("dim" -> "256")))
      .addWithParams("save", Operators.make(spark, "sink", "parquet",
        Map("path" -> out)))
      .execute()
    assert(result.columns.contains("tfidf"))
    assert(result.count() == 500)
  }

  test("quality_filter drops short and repetition-heavy docs only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and it is a fine day for all of us"),
      (2L, "too short"),
      (3L, ("spam spam spam " * 20).trim)
    ).toDF("doc_id", "text")
    val kept = Operators.make(spark, "transform", "quality_filter")(
      Seq(docs), Map.empty).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
  }

  test("dedup_exact_keep keeps the minimum id per normalized text") {
    import spark.implicits._
    val docs = Seq(
      (5L, "Hello World"), (3L, "  hello world  "), (7L, "unique text")
    ).toDF("doc_id", "text")
    val kept = Operators.make(spark, "transform", "dedup_exact_keep")(
      Seq(docs), Map.empty).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L), s"got $kept")
  }

  test("cosine_near_dup finds planted twins through the banded join") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // plant exact duplicates of every vector (cos = 1.0 pairs)
    val corpus = emb.unionByName(
      emb.select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding")))
    val pairs = Operators.make(spark, "transform", "cosine_near_dup",
      Map("minCosine" -> "0.99"))(Seq(corpus), Map.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    val expected = emb.select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 1000000L)).toSet
    assert(pairs == expected,
      s"expected $n twin pairs, got ${pairs.size}; missed=${(expected -- pairs).take(3)}")
  }

  test("stratified_sample is deterministic and respects quotas") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val mk = Operators.make(spark, "transform", "stratified_sample",
      Map("quotas" -> "en:500,de:200,es:200,fr:200,zh:200"))
    val a = mk(Seq(docs), Map.empty).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = mk(Seq(docs), Map.empty).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "hash-threshold sampling must be run-deterministic")
    assert(a.nonEmpty && a.size < docs.count())
    // extra_vars quota override shrinks the sample at execute time
    val tiny = mk(Seq(docs), Map("quotas" -> "en:10", "defaultPerMille" -> "10"))
      .count()
    assert(tiny < a.size)
  }

  test("mmr transform and bpe_segment vectorizer construct and run") {
    import spark.implicits._
    val cands = Seq(
      (0L, 1L, 0.9, Seq(1.0, 0.0)),
      (0L, 2L, 0.8, Seq(0.0, 1.0)),
      (0L, 3L, 0.7, Seq(0.5, 0.5))).toDF("qid", "id", "rel", "emb")
    val mmr = Operators.make(spark, "transform", "mmr", Map("k" -> "2"))
    val picks = mmr(Seq(cands), Map.empty).orderBy("step").collect()
    assert(picks.length == 2 && picks.map(_.getLong(2)).toSeq == Seq(1L, 2L))

    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val bpe = Operators.make(spark, "vectorizer", "bpe_segment",
      Map("numMerges" -> "4"))
    val pieces = bpe(Seq(docs), Map.empty)
    assert(pieces.columns.toSeq == Seq("doc_id", "piece"))
    assert(pieces.count() > 0)
  }

  test("rrf_fuse merges ranked lists with reciprocal-rank scores") {
    import spark.implicits._
    val sparse = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rnk")
    val dense = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rnk")
    val fuse = Operators.make(spark, "transform", "rrf_fuse",
      Map("k" -> "60", "topN" -> "3"))
    val out = fuse(Seq(sparse, dense), Map.empty).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 1L, 2L))
    // doc 3: in both lists → 1/63 + 1/61; doc 1: 1/61 alone — 3 wins
    val top = out.head.getDouble(1)
    assert(math.abs(top - (1.0 / 63 + 1.0 / 61)) < 1e-12)

    // weighted fusion: down-weighting the dense list flips 3 below 1
    val wfuse = Operators.make(spark, "transform", "rrf_fuse",
      Map("k" -> "60", "topN" -> "3", "weights" -> "1,0.02"))
    val wout = wfuse(Seq(sparse, dense), Map.empty).collect()
    assert(wout.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L))
  }

  test("pii_scrub redacts emails and IPs in place") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at alice.b@corp-mail.io today"),
      (2L, "server 192.168.1.7 responded"),
      (3L, "clean row")).toDF("doc_id", "text")
    val scrub = Operators.make(spark, "transform", "pii_scrub", Map.empty)
    val out = scrub(Seq(docs), Map.empty).orderBy("doc_id")
      .collect().map(_.getString(1)).toSeq
    assert(out == Seq("mail me at <EMAIL> today",
      "server <IP> responded", "clean row"))
  }

  test("weighted_sample keeps exactly k rows and matches the oracle " +
      "entry's pick on the same weights") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val samp = Operators.make(spark, "transform", "weighted_sample",
      Map("k" -> "50"))
    val out = samp(Seq(docs), Map.empty).cache()
    assert(out.count() == 50L)
    assert(out.columns.toSet == docs.columns.toSet) // helper cols dropped
    // same machinery as q_sample_weighted → its 100-pick must CONTAIN
    // every id the k=50 draw keeps (A-ES prefixes nest as k grows)
    val top100 = graft.queries.Sharding.q_sample_weighted
      .run(spark, TestSpark.sf0001).collect().map(_.getLong(0)).toSet
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(top100), "k=50 draw is not a prefix of the k=100 draw")
  }

  test("domain_cap keeps the window-rank top-k per group with full rows") {
    import spark.implicits._
    // one hot group (12 rows), two cold ones; score ties broken by id
    val rows = (1L to 12L).map(i => (i, "hot", i % 4, s"d$i")) ++
      Seq((20L, "cold", 9L, "d20"), (21L, "cold", 9L, "d21"), (30L, "solo", 1L, "d30"))
    val df = rows.toDF("doc_id", "source", "score_mu", "text")
    val cap = Operators.make(spark, "transform", "domain_cap", Map("k" -> "2"))
    val out = cap(Seq(df), Map.empty)
    assert(out.columns.toSet == df.columns.toSet) // full rows survive
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // window twin: row_number over (score DESC, id ASC) <= 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score_mu").desc, col("doc_id"))
    val want = df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"domain_cap $got != window twin $want")
    // k larger than every group passes everything through
    val all = Operators.make(spark, "transform", "domain_cap",
      Map("k" -> "99"))(Seq(df), Map.empty)
    assert(all.count() == df.count())
  }

  test("domain_cap drops an id's copy in a group whose heap rejected it") {
    import spark.implicits._
    // round-12 ADVICE: doc_id 10 lives under TWO sources — selected by
    // "a" (its only doc) but ranked 4th of 4 in "b" at k=3. An id-only
    // re-attach join would keep BOTH copies once "a" picked the id; the
    // (group, id) join must drop the (b, 10) row.
    val df = Seq(
      (10L, "a", 100L, "pa"),
      (10L, "b", 1L, "pb"), (11L, "b", 50L, "p1"),
      (12L, "b", 50L, "p2"), (13L, "b", 50L, "p3"))
      .toDF("doc_id", "source", "score_mu", "text")
    val out = Operators.make(spark, "transform", "domain_cap",
      Map("k" -> "3"))(Seq(df), Map.empty)
    val got = out.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 10L), ("b", 11L), ("b", 12L), ("b", 13L)))
  }

  test("winnow_pairs matches the oracle entry's pairs through the registry") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val out = Operators.make(spark, "transform", "winnow_pairs")(
      Seq(docs), Map.empty)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.queries.Dedup.q_dedup_winnow
      .run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "registry winnow_pairs diverged from q_dedup_winnow")
    // a permissive df cap with minShared=1 can only ADD pairs
    val loose = Operators.make(spark, "transform", "winnow_pairs",
      Map("maxDf" -> "1000", "minShared" -> "1"))(Seq(docs), Map.empty)
    assert(loose.count() >= want.size.toLong)
  }

  test("scrub_spans rewrites the non-keeper copy and passes unique docs " +
      "through") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e x"),
      (1L, "z a b c d e y"),
      (2L, "p q r s t u")).toDF("doc_id", "text")
    val scrub = Operators.make(spark, "transform", "scrub_spans", Map.empty)
    val out = scrub(Seq(docs), Map.empty).orderBy("doc_id")
      .select("text", "n_dropped")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b c d e" is shared by docs 0 and 1 → keeper 0; doc 1 keeps [z, y]
    assert(out == Seq(("a b c d e x", 0L), ("z y", 5L), ("p q r s t u", 0L)))
  }

  test("lm_score ranks fluent text below shuffled text") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val score = Operators.make(spark, "transform", "lm_score", Map.empty)
    val out = score(Seq(docs), Map.empty).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count()) // <2-token docs drop out
    // cross-entropy is a positive, finite per-doc signal
    import org.apache.spark.sql.functions.{col, min => smin, max => smax}
    val (lo, hi) = out
      .agg(smin(col("cross_entropy")), smax(col("cross_entropy")))
      .collect().headOption.map(r => (r.getDouble(0), r.getDouble(1))).get
    assert(lo > 0 && hi < 50 && lo < hi)
    // thresholding at the max keeps everything; below the min, nothing
    val all = score(Seq(docs), Map("maxEntropy" -> hi.toString)).count()
    val none = score(Seq(docs), Map("maxEntropy" -> (lo / 2).toString)).count()
    assert(all == n && none == 0)
    out.unpersist()
    ()
  }

  test("dsir_weight matches the oracle entry and filters by threshold") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val score = Operators.make(spark, "transform", "dsir_weight", Map.empty)
    val out = score(Seq(docs), Map.empty).cache()
    // same kernel as the oracle-checked q_dsir_weights (default params
    // == the entry's fixed form, modulo the entry's spread)
    val entry = graft.queries.Corpus.q_dsir_weights
      .run(spark, TestSpark.sf0001)
      .collect().map(_.toString).sorted.toSeq
    assert(out.collect().map(_.toString).sorted.toSeq == entry)
    // target-slice docs score higher on average than the rest — the
    // method's whole point (weights favor target-like documents)
    import org.apache.spark.sql.functions.{avg, col}
    val byTgt = out.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang") === "zh").agg(avg(col("dsir_logw")))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byTgt(true) > byTgt(false))
    // mode=filter returns original rows, thresholded at the median logw
    import org.apache.spark.sql.functions.expr
    val med = out.agg(expr("percentile(dsir_logw, 0.5)")).head().getDouble(0)
    val kept = Operators.make(spark, "transform", "dsir_weight",
      Map("mode" -> "filter", "minLogw" -> med.toString))(Seq(docs), Map.empty)
    assert(kept.columns.toSeq == docs.columns.toSeq)
    assert(kept.count() > 0 && kept.count() < docs.count())
    out.unpersist()
    ()
  }

  test("percentile_prune drops the bottom quintile per group") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val prune = Operators.make(spark, "transform", "percentile_prune", Map.empty)
    val out = prune(Seq(docs), Map.empty).cache()
    assert(out.columns.toSeq == docs.columns.toSeq) // original rows survive
    // exact per-language arithmetic: kept = n - floor(n/5)
    import org.apache.spark.sql.functions.col
    val perLang = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptLang = out.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (l, n) =>
      assert(keptLang.getOrElse(l, 0L) == n - n / 5, s"lang $l: n=$n")
    }
    // dropBottomPct=0 keeps everything
    val all = Operators.make(spark, "transform", "percentile_prune",
      Map("dropBottomPct" -> "0"))(Seq(docs), Map.empty)
    assert(all.count() == docs.count())
    out.unpersist()
    ()
  }

  test("parquet sink writes layout-partitioned training shards") {
    val out = tmp("ops-shards")
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .withColumn("bin", pmod(col("doc_id"), lit(4)))
    val sink = Operators.make(spark, "sink", "parquet",
      Map("path" -> out, "partitionBy" -> "bin"))
    val landed = sink(Seq(docs), Map.empty)
    assert(landed.count() == 500)
    // hive-style shard dirs exist → readers prune by bin
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("bin=")).sorted
    assert(dirs.toSeq == Seq("bin=0", "bin=1", "bin=2", "bin=3"))
  }

  test("index-tier sink + ann_search close the make_operator('sink','local') port path") {
    // the reference lifecycle: make_operator sink → insert/index →
    // search (factory.py:29-64, tasks/sinks/local/gann.py:196-259) —
    // here: registry-built workflow ingests + indexes, a second one
    // loads the persisted index and searches a query batch through it
    val idx = tmp("ops-ivf")
    val landed = new Workflow()
      .addWithParams("read", Operators.make(spark, "source", "parquet",
        Map("path" -> s"${TestSpark.sf0001}/embeddings.parquet")))
      .addWithParams("index", Operators.make(spark, "sink", "ivf",
        Map("path" -> idx, "idCol" -> "vec_id", "vecCol" -> "embedding",
          "k" -> "4")))
      .execute()
    assert(landed.count() == 500, "posting lists landed on disk")
    assert(landed.columns.contains("cluster"))
    val hits = new Workflow()
      .addWithParams("queries", Operators.make(spark, "source", "parquet",
        Map("path" -> s"${TestSpark.sf0001}/embeddings.parquet")))
      .addWithParams("probe", (ins, _) => ins.head.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .addWithParams("search", Operators.make(spark, "transform", "ann_search",
        Map("index" -> "ivf", "path" -> idx, "idCol" -> "vec_id",
          "vecCol" -> "embedding", "k" -> "5", "nprobe" -> "4")))
      .execute()
    assert(hits.count() == 25, "5 queries x k=5")
    assert(hits.columns.toSet == Set("qid", "vec_id", "dist", "rnk"))

    // filtered search: a SECOND input of allowed ids restricts
    // candidates pre-distance (the Milvus filter= kwarg)
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val allowedDf = emb.filter(col("label") < 3)
      .select(col("vec_id"))
    val allowed = allowedDf.collect().map(_.getLong(0)).toSet
    val fhits = Operators.make(spark, "transform", "ann_search",
      Map("index" -> "ivf", "path" -> idx, "idCol" -> "vec_id",
        "vecCol" -> "embedding", "k" -> "5", "nprobe" -> "4"))(
      Seq(queries, allowedDf), Map.empty)
    val ids = fhits.select("vec_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(allowed),
      "filtered ann_search returned ids outside the allowed set")
    // round 14: the compressed tiers take the filter frame too (the
    // former allowed-id rejection is gone) — a PQ index built through
    // the registry serves the same pre-distance-filtered search
    val pqIdx = tmp("ops-pq-filtered")
    Operators.make(spark, "sink", "pq",
      Map("path" -> pqIdx, "idCol" -> "vec_id", "vecCol" -> "embedding"))(
      Seq(emb), Map.empty)
    val pqHits = Operators.make(spark, "transform", "ann_search",
      Map("index" -> "pq", "path" -> pqIdx, "idCol" -> "vec_id",
        "k" -> "5"))(Seq(queries, allowedDf), Map.empty)
    val pqIds = pqHits.select("vec_id").collect().map(_.getLong(0))
    assert(pqIds.nonEmpty && pqIds.forall(allowed),
      "filtered pq ann_search returned ids outside the allowed set")
    // unknown index names still fail fast
    val e = intercept[IllegalArgumentException] {
      Operators.make(spark, "transform", "ann_search",
        Map("index" -> "nope", "path" -> idx, "idCol" -> "vec_id"))(
        Seq(queries, allowedDf), Map.empty)
    }
    assert(e.getMessage.contains("unknown ann_search index"))
  }

  test("all eight index sinks land state and serve ann_search") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    for (kind <- Seq("gann", "ivf", "pq", "ivfpq", "bq", "ivfbq", "sq", "ivfsq")) {
      val path = tmp(s"ops-$kind")
      val sink = Operators.make(spark, "sink", kind,
        Map("path" -> path, "idCol" -> "vec_id", "vecCol" -> "embedding"))
      val landed = sink(Seq(emb), Map.empty)
      assert(landed.count() >= 500, s"$kind landed its distributed state")
      val search = Operators.make(spark, "transform", "ann_search",
        Map("index" -> kind, "path" -> path, "idCol" -> "vec_id",
          "vecCol" -> "embedding", "k" -> "3"))
      val hits = search(Seq(queries), Map.empty)
      assert(hits.count() == 6, s"$kind: 2 queries x k=3")
    }
  }

  test("frequent_grams matches the oracle entry through the registry") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val op = Operators.make(spark, "transform", "frequent_grams", Map.empty)
    val got = op(Seq(docs), Map.empty)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val entry = graft.queries.CorpusOps.q_heavy_hitters
      .run(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == entry && got.nonEmpty)
    // a higher floor strictly shrinks the result
    val strict = Operators.make(spark, "transform", "frequent_grams",
      Map("minCount" -> "8"))(Seq(docs), Map.empty).count()
    assert(strict < got.size)
  }

  test("snapshot_delta classifies two-input snapshots") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val prev = docs.filter(col("doc_id") % 2 === 0) // odd ids are "added"
    val op = Operators.make(spark, "transform", "snapshot_delta", Map.empty)
    val out = op(Seq(docs, prev), Map.empty)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty && out.values.forall(_ == "added"))
    assert(out.keys.forall(_ % 2 == 1))
    intercept[IllegalArgumentException] {
      op(Seq(docs), Map.empty)
    }
    ()
  }

  test("end-to-end crawl batch: quarantine -> scrub -> quality -> dedup keeps composing") {
    // the full ingest story on one malformed crawl batch: malformed
    // lines quarantined, survivors PII-scrubbed, quality-filtered, and
    // exact-deduped — every stage a registry operator or source util
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e")
    dir.toFile.deleteOnExit()
    val good = "the quick brown fox jumps over a lazy dog while it runs to town and beyond"
    val lines = Seq(
      s"""{"doc_id": 1, "text": "$good one"}""",
      """{"doc_id": 2, "text": "contact me at bob@example.com"}""",
      """{"doc_id": 3 BROKEN""",
      s"""{"doc_id": 4, "text": "$good one"}""", // exact dup of 1
      s"""{"doc_id": 5, "text": "$good two"}""",
      """{"doc_id": 6, "text": "short"}""")
    val f = dir.resolve("crawl.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (clean, quarantine) = graft.sources.Sources
      .readWithQuarantine(spark, "json", dir.toString, schema)
    assert(quarantine.count() == 1)
    val out = new Workflow()
      .source("crawl", clean)
      .addWithParams("scrub", Operators.make(spark, "transform", "pii_scrub"))
      .addWithParams("quality",
        Operators.make(spark, "transform", "quality_filter"))
      .addWithParams("dedup",
        Operators.make(spark, "transform", "dedup_exact_keep"))
      .execute()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 quarantined; 2 and 6 fail the quality gate (too short /
    // stopword-poor after scrub); 4 deduped against 1 (min id kept)
    assert(out.keySet == Set(1L, 5L), s"got $out")
    assert(!out.values.exists(_.contains("bob@example.com")))
  }

  test("end-to-end crawl batch reaches training form: survivors pack into contiguous bins") {
    // the ingest story continued to the LAST training-build step: the
    // curated survivors packed into fixed token budgets through the
    // registry's pack_sequences verb (two-phase prefix offsets)
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e_pack")
    dir.toFile.deleteOnExit()
    val good = "the quick brown fox jumps over a lazy dog while it runs to town and beyond"
    val lines = (1 to 8).map(i =>
      s"""{"doc_id": $i, "text": "$good copy number $i", "lang": "${if (i % 2 == 0) "en" else "de"}"}""") :+
      """{"doc_id": 9 BROKEN"""
    val f = dir.resolve("crawl.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val (clean, quarantine) = graft.sources.Sources
      .readWithQuarantine(spark, "json", dir.toString, schema)
    assert(quarantine.count() == 1)
    val packed = new Workflow()
      .source("crawl", clean)
      .addWithParams("quality",
        Operators.make(spark, "transform", "quality_filter"))
      .addWithParams("pack",
        Operators.make(spark, "transform", "pack_sequences",
          Map("budget" -> "32", "blockDocs" -> "2")))
      .execute()
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.nonEmpty)
    // per language, offsets are the exact running sum of token counts in
    // doc_id order (the two-phase form must equal the naive cumsum), and
    // bins follow the 32-token budget
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, _, nTok, off, bin) =>
        assert(off == run, s"offset gap: $rows")
        assert(bin == off / 32)
        run += nTok
      }
    }
  }

  test("pack_sequences: null text clamps to n_tok 0 (never -1), null keys drop, " +
      "budget must be positive") {
    import spark.implicits._
    // arbitrary pipeline frame, NOT the documents table: null text,
    // null lang, null id all present
    val df = Seq(
      (Some(1L), Some("en"), Some("one two three")),
      (Some(2L), Some("en"), None), // null text -> size() = -1 raw
      (Some(3L), Some("en"), Some("four five")),
      (Some(4L), None, Some("dropped lang")),
      (None: Option[Long], Some("en"), Some("dropped id"))
    ).toDF("doc_id", "lang", "text")
    val out = Operators.make(spark, "transform", "pack_sequences",
        Map("budget" -> "4", "blockDocs" -> "2"))(Seq(df), Map.empty)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // null-key rows are dropped, not packed
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // the null-text doc packs as a zero-length sequence, and the
    // downstream offsets stay the exact cumsum (doc 3 starts at 3, not
    // at 2 — a -1 clamp failure would shift every later offset)
    assert(out.toSeq == Seq((1L, 3L, 0L), (2L, 0L, 3L), (3L, 2L, 3L)))
    val err = intercept[IllegalArgumentException] {
      Operators.make(spark, "transform", "pack_sequences",
        Map("budget" -> "0"))(Seq(df), Map.empty)
    }
    assert(err.getMessage.contains("budget"))
  }

  test("ladder_admit runs the composed admission ladder with tunable " +
      "tier thresholds and resumes across stage invocations") {
    import spark.implicits._
    def landChunk(dir: String, i: Int, rows: Seq[(Long, String)]): Unit = {
      val staging = tmp(s"ops-la-stage$i")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(staging))
        .iterator()
      val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(src,
        java.nio.file.Paths.get(dir, f"chunk$i%03d.parquet"))
      ()
    }
    // doc 2 is fully contained in doc 1 (1 shingle, 100%); doc 3 shares
    // 1 of its 4 shingles (25%) — under the default 4/5 containment it
    // is admitted, under a 1/5 threshold it is rejected: the knob must
    // reach the containment tier through the registry params
    val c0 = Seq(1L -> "alpha beta gamma delta epsilon zeta")
    val c1 = Seq(2L -> "gamma delta epsilon",
      3L -> "alpha beta gamma x1 y1 z1")
    def admittedWith(params: Map[String, String]): Map[Long, Long] = {
      val landing = tmp("ops-la-land"); val root = tmp("ops-la-root")
      val stage = Operators.make(spark, "sink", "ladder_admit",
        params ++ Map("path" -> landing, "stateRoot" -> root))
      landChunk(landing, 0, c0)
      stage(Seq.empty, Map.empty)
      // resume: a LATER invocation of the same stage sees new files and
      // continues admission against the earlier batches' state
      landChunk(landing, 1, c1)
      stage(Seq.empty, Map.empty)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val loose = admittedWith(Map.empty)
    assert(loose == Map(1L -> 1L, 3L -> 2L),
      s"default 4/5: doc 2 contained, doc 3 admitted — got $loose")
    val tight = admittedWith(Map("tauNum" -> "1", "tauDen" -> "5"))
    assert(tight == Map(1L -> 1L),
      s"1/5 threshold: doc 3's 25% overlap now rejects — got $tight")
  }

  test("compact_stream_state folds per-trigger dedup state into sized bases") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ops_css").toString
    // two triggers' worth of fp state, one dir each (the winnowAdmit
    // at-rest layout; batch comes back from the dir key)
    Seq((1L, 11L), (2L, 12L)).toDF("doc_id", "fp")
      .write.parquet(s"$root/fps/batch=0")
    Seq((3L, 11L)).toDF("doc_id", "fp")
      .write.parquet(s"$root/fps/batch=1")
    // containment posting + admitted output state: the status frame must
    // report EVERY kind the fold touches (round-13 advice — a
    // containment maintenance window used to report nothing at rest)
    Seq((1L, 77L, 77 % 256), (2L, 99L, 99 % 256)).toDF("doc_id", "g", "b")
      .write.parquet(s"$root/post/batch=0")
    Seq(Tuple1(1L)).toDF("doc_id").write.parquet(s"$root/admitted/batch=1")
    val status = Operators.make(spark, "sink", "compact_stream_state",
      Map("stateRoot" -> root))(Seq.empty, Map.empty)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(status.keySet == Set("fps", "post", "admitted"))
    assert(status("fps")._1 == 3L) // all rows at rest in the base
    assert(status("post")._1 == 2L)
    assert(status("admitted")._1 == 1L)
    assert(!new java.io.File(s"$root/fps").exists, "live dirs folded away")
    // batch survives as a data column for the < current pruning
    val base = spark.read.parquet(s"$root/fps_base")
    assert(base.columns.toSet == Set("doc_id", "fp", "batch"))
  }

  test("compact_index_blocks folds streamed blocks into the base assign") {
    import graft.index.GannIndex
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val model = GannIndex.build(e.filter(col("vec_id") < 400),
      "vec_id", "embedding", leafSize = 64, nTrees = 2)
    val path = java.nio.file.Files.createTempDirectory("graft_ops_cib").toString
    GannIndex.save(model, path)
    GannIndex.appendStreamBlock(model, path,
      e.filter(col("vec_id") >= 400), batchId = 0L)
    val baseRows = spark.read.parquet(s"$path/assign").count()
    val blockRows = spark.read.parquet(s"$path/assign_stream").count()
    val folded = Operators.make(spark, "sink", "compact_index_blocks",
      Map("path" -> path))(Seq.empty, Map.empty)
    assert(folded.count() == baseRows + blockRows)
    assert(!new java.io.File(s"$path/assign_stream").exists)
  }

  test("skew_join operator equals the plain join on a planted hot key") {
    import spark.implicits._
    // one hot key (0) carrying half the big side, plus a long tail
    val big = (1 to 200).map(i =>
      (if (i % 2 == 0) 0L else i.toLong % 7, i.toLong, s"p$i"))
      .toDF("k", "rid", "payload")
    val small = (0 to 6).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val out = Operators.make(spark, "transform", "skew_join",
      Map("keys" -> "k", "saltBy" -> "rid", "salt" -> "4"))(
      Seq(big, small), Map.empty)
    val want = big.join(small, Seq("k"))
    assert(out.columns.toSeq == want.columns.toSeq)
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty,
      "salted registry join must be row-identical to the plain join")
    intercept[IllegalArgumentException] {
      Operators.make(spark, "transform", "skew_join",
        Map("keys" -> "k", "saltBy" -> "rid"))(Seq(big), Map.empty)
    }
    // salt/numPartitions params thread through and stay row-identical:
    // collision-aware placement is a shuffle-layout property, never a
    // result property
    for ((s, np) <- Seq(("6", Some("12")), ("3", None))) {
      val out2 = Operators.make(spark, "transform", "skew_join",
        Map("keys" -> "k", "saltBy" -> "rid", "salt" -> s) ++
          np.map("numPartitions" -> _))(Seq(big, small), Map.empty)
      assert(out2.exceptAll(want).isEmpty && want.exceptAll(out2).isEmpty,
        s"salt=$s numPartitions=$np must stay row-identical")
    }
    ()
  }

  test("graph_reach operator computes the frontier-dedup closure") {
    import spark.implicits._
    // two components: 1->2->3->1 (cycle) and 4->5; start inside the cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val out = Operators.make(spark, "transform", "graph_reach",
      Map("start" -> "1"))(Seq(edges), Map.empty)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L),
      "must terminate on the cycle via frontier dedup and exclude 4/5")
  }

  test("pagerank operator runs over an edge-list input") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "weight")
    val out = Operators.make(spark, "transform", "pagerank",
      Map("iters" -> "5"))(Seq(edges), Map.empty)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(1L) > out(3L), "the doubly-linked hub outranks the leaf")
  }
}
