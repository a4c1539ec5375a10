package graft.queries

import graft.core.Tables
import graft.functions.TextF
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram language ID, document fingerprinting, and the
  * deterministic feature-hash text embedder (the offline stand-in for the
  * reference's model-backed text vectorizers,
  * radient/tasks/vectorizers/text/sbert.py:20-67 — same surface, hash
  * projection instead of a neural encoder; see SURVEY.md §7.0).
  *
  * Everything is a narrow per-row projection (no shuffle except the final
  * presentation ORDER BY and the embedder's groupBy), so each op scales
  * linearly with input splits.
  */
object TextAnalysis {
  import TextF._

  /** Per-language marker vocabularies for the n-gram language-ID heuristic.
    * Deterministic and tiny by design — the algorithm (hit-count argmax
    * with a fixed priority order) is the operator under test. */
  val langVocab: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "y", "es", "un", "una", "los"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "les"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "you", "wo", "ta"))

  val stopwords: Seq[String] = TextF.stopwords

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** The stopword list as a SQL IN-list (shared with Corpus oracles). */
  val stopwordsSql: String = sqlList(stopwords)

  val q_token_count = Q(
    "q_token_count",
    (s, dir) => {
      // bind the token split once per row (see Dedup.shingleDf note)
      Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          size(array_distinct(col("t"))).cast("long").as("n_unique"),
          size(shingles(col("t"), 2)).cast("long").as("n_bigrams"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_unique,
      |  CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS n_bigrams
      |FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)
      |ORDER BY doc_id
      |""".stripMargin))

  val q_text_quality = Q(
    "q_text_quality",
    (s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), col("n_chars"), size(col("t")).as("nt"),
          hitCount(col("t"), stopwords).as("sw"))
        .select(col("doc_id"),
          col("nt").cast("long").as("n_tokens"),
          (col("n_chars").cast("double") / greatest(col("nt"), lit(1)))
            .as("avg_token_span"),
          (col("sw").cast("double") / greatest(col("nt"), lit(1)))
            .as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id,
      |  CAST(nt AS BIGINT) AS n_tokens,
      |  CAST(n_chars AS DOUBLE) / greatest(nt, 1) AS avg_token_span,
      |  CAST(sw AS DOUBLE) / greatest(nt, 1) AS stopword_ratio
      |FROM (
      |  SELECT doc_id, n_chars, len(t) AS nt,
      |    len(list_filter(t, x -> x IN ${sqlList(stopwords)})) AS sw
      |  FROM (SELECT doc_id, n_chars, ${Sql.toks()} AS t FROM documents))
      |ORDER BY doc_id
      |""".stripMargin))

  /** Gopher-style quality-rule composite (the published rule family of
    * Rae et al. 2021 §A1.1, as C4/RefinedWeb-era pipelines apply it):
    * per-document word count, mean word length, symbol-token ratio,
    * duplicate-3-gram fraction, and required-stopword hits, plus the
    * conjunctive `keep` verdict. The rules here are the subset observable
    * on whitespace-tokenizable text (line-shape rules need newline
    * structure the corpus lacks). Every metric is an exact rational
    * (integer counts, one IEEE division), so the oracle hash-matches
    * with no tolerance. Scale: one narrow projection pass per document,
    * no shuffle but the presentation sort. */
  val q_gopher_rules = Q(
    "q_gopher_rules",
    (s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .withColumn("g", shingles(col("t"), 3))
        .select(
          col("doc_id"),
          size(col("t")).cast("long").as("n_words"),
          (aggregate(col("t"), lit(0), (acc, x) => acc + length(x)).cast("double")
            / greatest(size(col("t")), lit(1))).as("mean_word_len"),
          (size(filter(col("t"), x => x.rlike("[^a-z0-9]"))).cast("double")
            / greatest(size(col("t")), lit(1))).as("symbol_ratio"),
          when(size(col("g")) > 0,
            lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
            .otherwise(lit(0.0)).as("rep_ratio"),
          hitCount(col("t"), stopwords).cast("long").as("sw_hits"))
        .withColumn("keep",
          col("n_words") >= 30 && col("n_words") <= 100000 &&
            col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
            col("symbol_ratio") <= 0.1 &&
            col("rep_ratio") <= 0.3 &&
            col("sw_hits") >= 2)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id, n_words, mean_word_len, symbol_ratio, rep_ratio, sw_hits,
      |  (n_words >= 30 AND n_words <= 100000
      |   AND mean_word_len >= 3.0::DOUBLE AND mean_word_len <= 10.0::DOUBLE
      |   AND symbol_ratio <= 0.1::DOUBLE
      |   AND rep_ratio <= 0.3::DOUBLE
      |   AND sw_hits >= 2) AS keep
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(t) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS DOUBLE)
      |      / greatest(len(t), 1) AS mean_word_len,
      |    CAST(len(list_filter(t, x -> regexp_matches(x, '[^a-z0-9]'))) AS DOUBLE)
      |      / greatest(len(t), 1) AS symbol_ratio,
      |    CASE WHEN len(g) > 0
      |         THEN 1.0::DOUBLE - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
      |         ELSE 0.0::DOUBLE END AS rep_ratio,
      |    CAST(len(list_filter(t, x -> x IN ${sqlList(stopwords)})) AS BIGINT) AS sw_hits
      |  FROM (SELECT doc_id, t, ${Sql.shingles3("t")} AS g
      |        FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)))
      |ORDER BY doc_id
      |""".stripMargin))

  /** Within-document repetition (the C4/Gopher-family "duplicate n-gram
    * fraction" quality signal): share of word 3-grams that repeat an
    * earlier 3-gram in the same document — 1 − distinct/total. High
    * values flag boilerplate, spam and degenerate generations; a corpus
    * filter thresholds on it. Values are exact rationals (integer counts,
    * one IEEE division), so the oracle hash-matches with no tolerance.
    * Scale: a narrow per-row projection, no shuffle but the output sort. */
  val q_repetition_ratio = Q(
    "q_repetition_ratio",
    (s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .withColumn("g", shingles(col("t"), 3))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_trigrams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          when(col("n_trigrams") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_trigrams"))
            .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id,
      |  len(g) AS n_trigrams,
      |  len(list_distinct(g)) AS n_distinct,
      |  CASE WHEN len(g) > 0
      |       THEN 1.0::DOUBLE - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
      |       ELSE 0.0::DOUBLE END AS rep_ratio
      |FROM (SELECT doc_id, ${Sql.shingles3("t")} AS g
      |      FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents))
      |ORDER BY doc_id
      |""".stripMargin))

  val q_lang_id = Q(
    "q_lang_id",
    (s, dir) => {
      val withHits = Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .select(Seq(col("doc_id"), col("lang").as("true_lang")) ++
          langVocab.map { case (l, v) =>
            hitCount(col("t"), v).cast("long").as(s"hits_$l") }: _*)
      // argmax with fixed priority order = first lang whose count ties max
      val pred = langVocab.map(_._1).foldRight(lit("und"): org.apache.spark.sql.Column) {
        case (l, acc) =>
          val isMax = langVocab.map(_._1).filter(_ != l)
            .map(o => col(s"hits_$l") >= col(s"hits_$o"))
            .reduce(_ && _)
          when(isMax && col(s"hits_$l") > 0, lit(l)).otherwise(acc)
      }
      withHits.withColumn("pred_lang", pred)
        .orderBy(col("doc_id"))
    },
    Some {
      val hitCols = langVocab.map { case (l, v) =>
        s"len(list_filter(t, x -> x IN ${sqlList(v)})) AS hits_$l"
      }.mkString(",\n    ")
      val langs = langVocab.map(_._1)
      val cases = langs.map { l =>
        val cond = langs.filter(_ != l).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
        s"WHEN $cond AND hits_$l > 0 THEN '$l'"
      }.mkString("\n    ")
      s"""
      |SELECT doc_id, true_lang, ${langs.map(l => s"hits_$l").mkString(", ")},
      |  CASE $cases ELSE 'und' END AS pred_lang
      |FROM (
      |  SELECT doc_id, lang AS true_lang,
      |    $hitCols
      |  FROM (SELECT doc_id, lang, ${Sql.toks()} AS t FROM documents))
      |ORDER BY doc_id
      |""".stripMargin
    })

  val q_doc_fingerprint = Q(
    "q_doc_fingerprint",
    (s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"),
          fingerprint(col("t")).as("fingerprint"),
          simhash60(col("t")).as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id,
      |  coalesce(list_min(list_transform(${Sql.shingles3("t")}, s -> ${Sql.h32("s")})), -1) AS fingerprint,
      |  ${Sql.simhash60("t")} AS simhash
      |FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Winnowing fingerprint SET (the MOSS/Schleimer-Wilkerson-Aiken
    * scheme): per document, hash every word 3-shingle, slide a window of
    * w=4 positions, keep each window's MINIMUM hash, dedupe — the
    * position-robust fingerprint set whose guarantee the global-min
    * fingerprint ([[q_doc_fingerprint]]) can't give: any shared run of
    * ≥ w+2 tokens between two documents shares at least one selected
    * fingerprint, so partial overlaps (quotes, boilerplate blocks) are
    * detectable from fingerprint intersections at ~1/w of the shingle
    * volume. Documents with fewer than w shingles emit nothing
    * (identically in both engines).
    *
    * Scale shape: the window partitions by doc_id and orders by
    * position — groups bounded by DOCUMENT length, never corpus size
    * (the same bound as the containment prefix window) — and the
    * distinct collapses map-side before the presentation sort. The
    * downstream join story is the usual posting equi-join on fp. */
  /** (doc_id, fp) winnowing fingerprint pairs, deduped — shared by
    * [[q_doc_winnow]] and the overlap join ([[Dedup.q_dedup_winnow]]).
    *
    * The window-min runs INSIDE the per-document array (sequence →
    * slice → array_min higher-order functions, whole-stage codegen):
    * the first cut of this operator exploded every shingle position and
    * ran a doc-partitioned running-min WINDOW, which sorts the entire
    * exploded corpus by (doc_id, pos) — 9.9 s at sf0.1 and 3.7× at 10×
    * data, all of it sort+shuffle that the per-row form doesn't do.
    * Here nothing leaves the scan task until the deduped fingerprints
    * explode (O(selected) rows, ~1/w of shingle volume). */
  private[graft] def winnowFps(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("hs", transform(shingles(tokens(col("text")), 3),
        s => h32(s)))
      .filter(size(col("hs")) >= 4)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("hs")) - 4),
          i => array_min(slice(col("hs"), i + lit(1), lit(4)))))).as("fp"))

  /** The q_doc_winnow winnow CTE, shared with the overlap join's oracle:
    * yields DISTINCT (doc_id, fp). */
  private[queries] val winnowSql: String = s"""
      |sh AS (
      |  SELECT doc_id, unnest(g) AS s, generate_subscripts(g, 1) AS pos,
      |    len(g) AS n
      |  FROM (SELECT doc_id, ${Sql.shingles3("t")} AS g
      |        FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents))),
      |h AS (SELECT doc_id, pos, n, ${Sql.h32("s")} AS hv FROM sh),
      |wn AS (SELECT doc_id, pos, n,
      |        min(hv) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |      FROM h),
      |fps AS (SELECT DISTINCT doc_id, fp FROM wn WHERE pos <= n - 3)""".stripMargin

  val q_doc_winnow = Q(
    "q_doc_winnow",
    (s, dir) =>
      winnowFps(Tables.spread(Tables(s, dir, "documents")))
        .orderBy(col("doc_id"), col("fp")),
    Some(s"""
      |WITH $winnowSql
      |SELECT doc_id, fp FROM fps
      |ORDER BY doc_id, fp
      |""".stripMargin))

  /** Vocabulary growth curve (Heaps' law, measured): the corpus in 20
    * equal doc-id slices, with the count of word types whose FIRST
    * occurrence falls in each slice and the running vocabulary size —
    * the curve that sizes tokenizer vocabularies and predicts OOV rates
    * as a corpus grows ([[Corpus.q_ngram_novelty]] is the per-document
    * attribution twin; this is the corpus-level summary).
    *
    * Scale shape: one (token → min doc_id) aggregate — vocabulary-sized,
    * map-side combined, the same shuffle class as every term-statistics
    * entry — then bucketing against a broadcast 1-row max and a running
    * sum over the ≤20-row bucket table (the global window orders 20
    * rows, never corpus rows). The slice width comes from the CORPUS
    * max doc_id (round-12 ADVICE: the max FIRST-occurrence id collapses
    * the trailing slices whenever the last documents introduce no new
    * types — slices are of the doc-id range, not of where novelty
    * happens to stop), a 1-row aggregate of the same scan; ALL 20
    * slices are emitted, zero-count included, because the flat
    * saturation tail IS the Heaps measurement (a templated corpus
    * whose vocabulary is exhausted in slice 0 reports exactly that). */
  val q_vocab_growth = Q(
    "q_vocab_growth",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.spread(Tables(s, dir, "documents"))
      val tk = docs
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("tok"))
      val first = tk.groupBy(col("tok")).agg(min(col("doc_id")).as("fd"))
      val maxd = broadcast(docs.agg(max(col("doc_id")).as("maxd")))
      val buckets = first.crossJoin(maxd)
        .select(expr("(fd * 20) div (maxd + 1)").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
      val grid = s.range(20).select(col("id").as("bucket"))
      grid.join(buckets, Seq("bucket"), "left")
        .select(col("bucket"),
          coalesce(col("new_types"), lit(0L)).as("new_types"))
        .select(col("bucket"), col("new_types"),
          sum(col("new_types")).over(Window.orderBy(col("bucket")))
            .as("cum_types"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      |WITH tk AS (SELECT doc_id, unnest(list_distinct(t)) AS tok
      |            FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)),
      |f AS (SELECT tok, min(doc_id) AS fd FROM tk GROUP BY tok),
      |m AS (SELECT max(doc_id) AS maxd FROM documents),
      |b AS (SELECT (fd * 20) // (maxd + 1) AS bucket, count(*) AS new_types
      |      FROM f, m GROUP BY 1),
      |g AS (SELECT range AS bucket FROM range(20)),
      |bb AS (SELECT g.bucket, coalesce(b.new_types, 0) AS new_types
      |       FROM g LEFT JOIN b USING (bucket))
      |SELECT bucket, new_types,
      |  CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types
      |FROM bb ORDER BY bucket
      |""".stripMargin))

  /** Deterministic feature-hash embedding (dim=16): bucket = h32(tok) mod
    * dim, sign = ±1 from a salted hash, value = Σ signs. Integer-exact →
    * oracle hash-matches with no float tolerance. Long format (doc_id,
    * pos, val) keeps the oracle comparable without array equality. */
  val q_embed_hash = Q(
    "q_embed_hash",
    (s, dir) => {
      val dim = 16
      Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          featureBucket(col("tok"), dim).as("pos"),
          featureSign(col("tok")).as("sgn"))
        .groupBy(col("doc_id"), col("pos"))
        .agg(sum(col("sgn")).as("val"))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some(s"""
      |SELECT doc_id,
      |  ${Sql.h32("tok")} % 16 AS pos,
      |  CAST(sum(2 * (${Sql.h32("'s#' || tok")} % 2) - 1) AS BIGINT) AS val
      |FROM (SELECT doc_id, unnest(${Sql.toks()}) AS tok FROM documents)
      |GROUP BY doc_id, pos
      |ORDER BY doc_id, pos
      |""".stripMargin))

  /** TF-IDF top terms per document (the CountVectorizer+IDF surface,
    * SURVEY.md §2.3 sklearn row). The importance score is tf·(N/df) — a
    * "linear idf" instead of ln(N/df), deliberately: tf·N is an exact
    * integer and one IEEE division is bit-identical across engines,
    * whereas ln() is not covered by IEEE 754 and could perturb ranking
    * ties. Monotone in df and tf like the classic weighting.
    *
    * Scale: two hash aggregates (tf, then df) + a broadcast 1-row count —
    * df is the only cross-document shuffle and it moves (term, count)
    * pairs, never documents. */
  val q_tfidf_top_terms = Q(
    "q_tfidf_top_terms",
    (s, dir) => {
      // fit-once postings (memoized per app+dataset — see Postings)
      val p = Postings(s, dir)
      val (tf, dfreq, n) = (p.tf, p.dfreq, p.n)
      val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("tok"))
      tf.join(dfreq, Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          col("score"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    },
    Some(s"""
      |WITH t AS (SELECT doc_id, unnest(${Sql.toks()}) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, tok, tf, df, score, rnk FROM (
      |  SELECT doc_id, tok, tf, df,
      |    CAST(tf * n AS DOUBLE) / df AS score,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY CAST(tf * n AS DOUBLE) / df DESC, tok) AS rnk
      |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
      |WHERE rnk <= 3
      |ORDER BY doc_id, rnk
      |""".stripMargin))

  /** Fixed-size token chunking — the document fan-out transform shape
    * (one doc → n chunk rows: the page-screenshot / clip-split / chunked
    * speech-to-text contract of SURVEY.md §2.2) with an exact oracle.
    * 32-token chunks; documents shorter than one chunk yield one chunk;
    * empty docs yield zero rows (guarded sequence, like
    * Multimodal.clipSplit). */
  val q_doc_chunks = Q(
    "q_doc_chunks",
    (s, dir) => {
      val k = 32
      val d = Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .withColumn("n_chunks",
          ceil(size(col("t")).cast("double") / k).cast("int"))
      val idx = when(col("n_chunks") > 0,
        sequence(lit(0), col("n_chunks") - 1)).otherwise(array().cast("array<int>"))
      d.select(col("doc_id"),
          posexplode(transform(idx, i => slice(col("t"), i * k + 1, lit(k))))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          concat_ws(" ", col("chunk")).as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""
      |WITH t AS (SELECT doc_id, ${Sql.toks()} AS t FROM documents),
      |c AS (SELECT doc_id, t,
      |        unnest(range(0, CAST(ceil(len(t) / 32.0) AS INT))) AS chunk_idx
      |      FROM t)
      |SELECT doc_id, chunk_idx,
      |  len(list_slice(t, chunk_idx * 32 + 1, chunk_idx * 32 + 32)) AS chunk_tokens,
      |  array_to_string(list_slice(t, chunk_idx * 32 + 1, chunk_idx * 32 + 32), ' ') AS chunk_text
      |FROM c
      |ORDER BY doc_id, chunk_idx
      |""".stripMargin))

  /** Binary page fan-out — the document-screenshot transform
    * (radient/tasks/transforms/document_screenshot/pymupdf.py:22-47) as a
    * query: the document payload as BYTES → one row per fixed 256-byte
    * page via Multimodal.pageSplit, with exact per-page byte counts and
    * checksums. The corpus is pure ASCII, so DuckDB's VARCHAR substring
    * is byte-identical to Spark's binary slice and md5(VARCHAR) hashes
    * the same octets as Spark's md5(binary) — a content-exact oracle for
    * a binary fan-out. Scale: narrow per-row explode, no shuffle before
    * the presentation sort. */
  val q_doc_pages = Q(
    "q_doc_pages",
    (s, dir) => {
      val PAGE = 256
      val d = Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
      graft.vectorize.Multimodal.pageSplit(d, "payload", PAGE)
        .select(col("doc_id"),
          col("page_idx").cast("long").as("page_idx"),
          octet_length(col("page_data")).cast("long").as("page_bytes"),
          md5(col("page_data")).as("page_md5"))
        .orderBy(col("doc_id"), col("page_idx"))
    },
    Some("""
      |WITH p AS (
      |  SELECT doc_id, text AS t,
      |    unnest(range(0, CAST(ceil(octet_length(encode(text)) / 256.0) AS INT))) AS page_idx
      |  FROM documents)
      |SELECT doc_id, page_idx,
      |  octet_length(encode(substring(t, CAST(page_idx*256 + 1 AS INT), 256))) AS page_bytes,
      |  md5(substring(t, CAST(page_idx*256 + 1 AS INT), 256)) AS page_md5
      |FROM p
      |ORDER BY doc_id, page_idx
      |""".stripMargin))

  /** Top-20 bigram collocations by PMI (pointwise mutual information,
    * Church & Hanks '90) with a count floor — the phrase-mining /
    * collocation pass a corpus analysis runs before tokenizer or
    * stopword decisions. PMI = ln((c_b/N_b) / ((c_w1/N_u)·(c_w2/N_u)))
    * over exact integer counts, so both engines compute the identical
    * double and the ties order on the rounded value.
    *
    * Scale shape: two hash aggregates over (token) and (bigram) — both
    * map-side combined, nothing but (key, count) pairs shuffle; the
    * unigram counts join back onto the floored bigram table (vocabulary-
    * sized after the floor) on token equi-keys; the two grand totals are
    * 1-row broadcast crossJoins; the top-20 is TakeOrderedAndProject.
    * At 100 TB the only full-corpus passes are the two token scans. */
  val q_pmi_bigrams = Q(
    "q_pmi_bigrams",
    (s, dir) => {
      // token arrays materialized once behind a cache: both the unigram
      // and bigram passes read them (the quality_filter / shingleDf
      // boundary lesson — without it pushdown re-inlines tokenization
      // into each pass)
      val bound = graft.core.Caches.cached(
        Tables.spread(Tables(s, dir, "documents"))
          .select(tokens(col("text")).as("t")))
      val uni = bound.select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val big = graft.core.Caches.cached(
        bound.select(explode(shingles(col("t"), 2)).as("bg"))
          .groupBy(col("bg")).agg(count(lit(1)).as("cb")))
      val nu = broadcast(uni.agg(sum(col("cw")).as("nu")))
      val nb = broadcast(big.agg(sum(col("cb")).as("nb")))
      val floored = big.filter(col("cb") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
      floored
        .join(uni.select(col("w").as("w1"), col("cw").as("cw1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("cw").as("cw2")), Seq("w2"))
        .crossJoin(nu).crossJoin(nb)
        .select(col("bg").as("bigram"), col("cb").as("n_pair"),
          round(log((col("cb") / col("nb")) /
            ((col("cw1") / col("nu")) * (col("cw2") / col("nu")))), 6).as("pmi"))
        .orderBy(desc("pmi"), col("bigram"))
        .limit(20)
    },
    Some(s"""
      |WITH d AS (SELECT ${Sql.toks()} AS t FROM documents),
      |uni AS (SELECT w, count(*) AS cw
      |        FROM (SELECT unnest(t) AS w FROM d) GROUP BY w),
      |big AS (SELECT bg, count(*) AS cb
      |        FROM (SELECT unnest(${Sql.shingles2("t")}) AS bg FROM d)
      |        GROUP BY bg),
      |nu AS (SELECT CAST(sum(cw) AS DOUBLE) AS nu FROM uni),
      |nb AS (SELECT CAST(sum(cb) AS DOUBLE) AS nb FROM big)
      |SELECT bg AS bigram, cb AS n_pair,
      |  round(ln((cb::DOUBLE / nb) /
      |    ((u1.cw::DOUBLE / nu) * (u2.cw::DOUBLE / nu))), 6) AS pmi
      |FROM big
      |JOIN uni u1 ON u1.w = split_part(bg, ' ', 1)
      |JOIN uni u2 ON u2.w = split_part(bg, ' ', 2)
      |CROSS JOIN nu CROSS JOIN nb
      |WHERE cb >= 5
      |ORDER BY pmi DESC, bigram LIMIT 20
      |""".stripMargin))

  /** Exact per-language length quantiles (p10/p25/p50/p75/p90/p99 of
    * n_chars) — the distribution profile a curation run reads before
    * setting its Gopher-style length cutoffs. Selection is rank-based:
    * the value at row ⌈p·n/100⌉ of the (n_chars, doc_id) order within
    * each language — INTEGER ceil-division ((p·n+99) div 100), so both
    * engines compute the identical position (a fractional-percentile
    * form hits the DECIMAL-vs-DOUBLE literal split: DuckDB parses 0.1
    * as DECIMAL and Spark as double, and ceil(0.1·500) then differs at
    * the ulp).
    *
    * Plan (round 11 — histogram-rank, the [[q_quality_percentile_filter]]
    * decomposition): the value at any rank is a function of the
    * (lang, n_chars) HISTOGRAM alone — ties share one value, so the
    * within-tie doc_id order the rank formula nominally references can
    * never change which n_chars is selected. One map-side-combined
    * groupBy(lang, n_chars) shuffle over the corpus, then cumulative
    * counts + the rank probe run entirely over the aggregate (≤ distinct
    * n_chars values per language — bounded by max document length, NOT
    * by corpus size). The quantile value is the unique histogram row
    * with cum−c < ⌈p·n/100⌉ ≤ cum. No per-language corpus sort window
    * remains (the pre-r11 form sorted every language's rows in one
    * window group — a single-task straggler at 10¹² docs);
    * PlanShapeSpec pins the absence of doc-ordered windows here. */
  val q_profile_quantiles = Q(
    "q_profile_quantiles",
    (s, dir) => {
      val hist = Tables(s, dir, "documents")
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
      hist
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("lang")).orderBy(col("n_chars"))))
        .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("n_chars"), col("c"), col("cum"), col("cnt"),
          explode(typedLit(Seq(10, 25, 50, 75, 90, 99))).as("p"))
        .withColumn("r", expr("(p * cnt + 99) div 100"))
        .filter(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
        .select(col("lang"), col("p"), col("n_chars").as("q_chars"))
        .orderBy(col("lang"), col("p"))
    },
    Some("""
      |WITH ranked AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS cnt
      |  FROM documents)
      |SELECT lang, p, n_chars AS q_chars
      |FROM ranked, UNNEST([10, 25, 50, 75, 90, 99]) AS t(p)
      |WHERE rn = (p * cnt + 99) // 100
      |ORDER BY lang, p
      |""".stripMargin))

  /** CCNet-style per-language percentile prune: keep each language's
    * documents above its own 20th percentile of stopword density — the
    * quality-filter recipe that prunes per-LANGUAGE (a global threshold
    * lets a high-resource language's distribution set the bar for every
    * other one; CCNet and the Gopher pipeline both cut by within-group
    * percentile for exactly that reason). The cut is an exact integer
    * rank test (`5·rn > n` ⇔ rn above ⌊n/5⌋), ties broken by doc_id, so
    * the keep set is deterministic and the oracle hash-matches.
    *
    * The per-language rank is computed WITHOUT a per-language window:
    * ordering is by the 6-dp-quantized score (the emitted precision —
    * the quantized basis is the cross-engine contract, mirrored in the
    * oracle's ORDER BY) with doc_id tie-break, and decomposes exactly as
    *
    *   rn = (#docs in lang with smaller score)            — score histogram
    *      + (#tie docs in earlier doc_id blocks)          — tie-shard bases
    *      + row_number inside the (lang, score, block)    — bounded group
    *
    * The histogram is bounded by 10⁶+1 integer-micro values per language
    * no matter the corpus size (its cumsum runs over that aggregate, not
    * the corpus); tie groups — at 10¹² docs a single score value can
    * hold ~10⁶ docs per language — are split by the same `doc_id DIV
    * blockDocs` monotone blocks as [[Corpus.packOffsets]], so every
    * window group in the plan is bounded by blockDocs or by the
    * shard-count. ONE corpus shuffle (the (lang, score, block) window;
    * the tie-count branch reuses that exchange), plus narrow
    * aggregate-sized joins that never reshuffle the corpus. Payloads
    * never shuffle — only (doc_id, lang, score) enters. */
  val q_quality_percentile_filter = Q(
    "q_quality_percentile_filter",
    (s, dir) => {
      val b = Corpus.packBlockDocs(s)
      val scored = Tables(s, dir, "documents")
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), col("lang"),
          (hitCount(col("t"), stopwords).cast("double") /
            greatest(size(col("t")), lit(1))).as("score"))
        .withColumn("si",
          expr("CAST(round(round(score, 6) * 1000000, 0) AS BIGINT)"))
        .withColumn("_shard", expr(s"doc_id DIV $b"))
        .filter(col("lang").isNotNull && col("si").isNotNull &&
          col("_shard").isNotNull)
      // local rank inside the bounded (lang, score, block) group
      val local = scored.withColumn("_lrn", row_number().over(
        Window.partitionBy(col("lang"), col("si"), col("_shard"))
          .orderBy(col("doc_id"))).cast("long"))
      // per-(lang, score, block) counts — reuses the window's exchange
      // (grouping keys equal the partitioning keys), and BOTH aggregate
      // branches below derive from it, so the corpus (and its
      // tokenization) is scanned exactly once
      val shardCounts = local.groupBy(col("lang"), col("si"), col("_shard"))
        .agg(max(col("_lrn")).as("_cnt"))
      // tie-shard bases: exclusive cumsum over block order inside each tie
      val tieBase = shardCounts
        .withColumn("_tbase", coalesce(sum(col("_cnt")).over(
          Window.partitionBy(col("lang"), col("si")).orderBy(col("_shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("lang"), col("si"), col("_shard"), col("_tbase"))
      // score histogram: ≤10⁶+1 rows per language, aggregated from the
      // shard counts (not the corpus); exclusive cumsum over score order
      // + the language total, both over the aggregate only
      val scoreBase = shardCounts.groupBy(col("lang"), col("si"))
        .agg(sum(col("_cnt")).as("_c"))
        .withColumn("_sbase", coalesce(sum(col("_c")).over(
          Window.partitionBy(col("lang")).orderBy(col("si"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("_c")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("si"), col("_sbase"), col("n"))
      // combine the two aggregate tables first (both narrow) so the
      // corpus side joins ONCE, on its own partitioning keys
      val bases = tieBase.join(scoreBase, Seq("lang", "si"))
        .select(col("lang"), col("si"), col("_shard"),
          (col("_tbase") + col("_sbase")).as("_base"), col("n"))
      local.join(bases, Seq("lang", "si", "_shard"))
        .withColumn("rn", col("_base") + col("_lrn"))
        .filter(col("rn") * 5 > col("n"))
        .select(col("doc_id"), col("lang"),
          round(col("score"), 6).as("score"), col("rn"))
        .orderBy(col("lang"), col("rn"))
    },
    Some(s"""
      |WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(t, x -> x IN $stopwordsSql)) AS DOUBLE)
      |      / greatest(len(t), 1) AS score
      |  FROM (SELECT doc_id, lang, ${Sql.toks()} AS t FROM documents
      |        WHERE doc_id IS NOT NULL AND lang IS NOT NULL)),
      |ranked AS (
      |  SELECT doc_id, lang, score,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY CAST(round(round(score, 6) * 1000000, 0) AS BIGINT),
      |        doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM scored)
      |SELECT doc_id, lang, round(score, 6) AS score, rn
      |FROM ranked WHERE rn * 5 > n
      |ORDER BY lang, rn
      |""".stripMargin))

  /** Markup normalization — the strip-boilerplate stage every
    * web-scraped corpus passes through before tokenization. The corpus
    * is plain text, so the markup is CONSTRUCTED in-query (the
    * planted-twin pattern: both engines wrap each document in the same
    * div/p/br skeleton, making the STRIP the operator under test and
    * the result hash-exact): strip tags with one `<[^>]+>` regex pass,
    * collapse whitespace, trim; emit length + md5 of the cleaned text.
    * Scale: narrow per-row projection, no shuffle but the presentation
    * sort. */
  val q_strip_markup = Q(
    "q_strip_markup",
    (s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("<div id=\""), col("doc_id"), lit("\"><p>"),
            col("text"), lit("</p><br/></div>")).as("html"))
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(col("html"), "<[^>]+>", " "),
            "\\s+", " ")).as("clean"))
        .select(col("doc_id"),
          length(col("clean")).cast("long").as("n_clean"),
          md5(col("clean")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      |SELECT doc_id,
      |  CAST(length(clean) AS BIGINT) AS n_clean,
      |  md5(clean) AS clean_md5
      |FROM (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(
      |    '<div id="' || doc_id || '"><p>' || text || '</p><br/></div>',
      |    '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
      |  FROM documents)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Per-document n-gram novelty — for each doc, how many of its DISTINCT
    * 3-shingles appear for the FIRST time in the corpus' doc_id order
    * (global first-occurrence owner = min doc_id per shingle). The crawl
    * curation signal behind "is this page adding anything new?": a
    * deduplicated crawl snapshot shows novelty decaying as boilerplate
    * saturates, and docs with n_novel = 0 are pure recombinations of
    * already-seen phrasing. Exact integers — no float anywhere.
    *
    * Scale shape: one explode → distinct-shingle postings, ONE shuffle on
    * the shingle for the min-doc_id owner table, one shuffle back on
    * doc_id for the per-doc counts; the left join restoring zero-shingle
    * docs is doc_id-keyed. No windows, no driver state — the same
    * posting discipline as the dedup family. */
  val q_ngram_novelty = Q(
    "q_ngram_novelty",
    (s, dir) => {
      val docs = Tables.spread(Tables(s, dir, "documents"))
      val sh = docs.select(col("doc_id"),
        explode(TextF.shingleSet(TextF.tokens(col("text")), 3)).as("s"))
      val firsts = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
      val stats = sh.join(firsts, Seq("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_novel"))
      docs.select(col("doc_id"))
        .join(stats, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH t AS (SELECT doc_id, ${Sql.toks()} AS t FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(${Sql.shingles3("t")})) AS s FROM t),
      |f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
      |st AS (
      |  SELECT doc_id, count(*) AS n_distinct,
      |    CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_novel
      |  FROM sh JOIN f USING (s) GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(n_distinct, 0) AS n_distinct,
      |  coalesce(n_novel, 0) AS n_novel
      |FROM documents d LEFT JOIN st USING (doc_id)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Per-document unigram Shannon entropy (nats) — the smooth
    * repetitiveness signal next to q_repetition_ratio's hard top-gram
    * fraction: H = −Σ p·ln p over the doc's token distribution, low for
    * keyword-stuffed / template junk, high for diverse prose. Gopher-class
    * pipelines threshold both.
    *
    * Exactness: the [[Sql.lmFold]] integer-micros discipline — H =
    * −(1/dl)·Σ tf·ln(tf/dl), so the one ln per DISTINCT (doc, token)
    * rounds to 6 dp, lifts to BIGINT micros, weights by integer tf, sums
    * order-independently, and divides back with the identical final
    * operation order on both engines ([[Sql.lmEntropy]] shape).
    *
    * Scale shape: rides the memoized Postings tf cache — one doc_id
    * aggregate for dl, one doc_id-keyed join + integer HashAggregate
    * fold; vocabulary-bounded per-doc distinct terms, no windows. */
  val q_unigram_entropy = Q(
    "q_unigram_entropy",
    (s, dir) => {
      val p = Postings(s, dir)
      val dl = p.tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      p.tf.join(dl, Seq("doc_id"))
        .select(col("doc_id"), col("dl"),
          (col("tf") * round(round(log(col("tf").cast("double") / col("dl")), 6)
            * lit(1e6)).cast("long")).as("mu"))
        .groupBy(col("doc_id"))
        .agg(first(col("dl")).as("n_tokens"), sum(col("mu")).as("h_mu"))
        .select(col("doc_id"), col("n_tokens"),
          round((-col("h_mu")).cast("double") / lit(1e6) / col("n_tokens"), 6)
            .as("entropy"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH t AS (SELECT doc_id, unnest(${Sql.toks()}) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |terms AS (
      |  SELECT doc_id, dl,
      |    tf * CAST(round(round(ln(tf::DOUBLE / dl), 6) * 1000000, 0) AS BIGINT)
      |      AS mu
      |  FROM tf JOIN dl USING (doc_id)),
      |folded AS (
      |  SELECT doc_id, any_value(dl) AS n_tokens,
      |    CAST(sum(mu) AS BIGINT) AS h_mu
      |  FROM terms GROUP BY doc_id)
      |SELECT doc_id, n_tokens,
      |  round(-h_mu::DOUBLE / 1000000.0 / n_tokens, 6) AS entropy
      |FROM folded ORDER BY doc_id
      |""".stripMargin))

  /** Per-source unigram-distribution drift — KL(p_source ‖ p_corpus) for
    * every ingestion source, the mixture-health dashboard number a data
    * team watches to catch a crawl/feed whose token distribution is
    * sliding away from the corpus (the monitoring twin of
    * [[Corpus.q_dsir_weights]]'s per-doc selection: DSIR scores documents
    * against a target, this scores whole SOURCES against the blend).
    * KL = Σ_w p_s(w)·ln(p_s(w)/p(w)) = (Σ_w c_sw·ln(c_sw·n / (n_s·c_w)))
    * / n_s, all counts from one token pass. Absent words contribute
    * exactly 0 (0·ln 0), so the inner join over observed (source, word)
    * pairs IS the full sum — no smoothing needed.
    *
    * Cross-engine exactness: the ln-ratio rides the lmCrossEntropy
    * integer-micros discipline — the ratio is an exact-integer product
    * quotient evaluated identically on both engines, ln is rounded to
    * 6 dp and lifted to BIGINT micros, the per-source fold is an
    * order-independent integer sum, and the two final divisions run in
    * the same order. Scale shape: one explode pass; (source, w) and w
    * partial-aggregate map-side down to vocabulary-bounded tables; the
    * only shuffle of note keys on w; source totals and the grand total
    * broadcast. */
  val q_source_kl = Q(
    "q_source_kl",
    (s, dir) => {
      val tok = graft.core.Caches.cached(
        Tables.spread(Tables(s, dir, "documents"))
          .select(col("source"), explode(tokens(col("text"))).as("w")))
      val sw = tok.groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c_sw"))
      val stot = tok.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val wtot = tok.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      val ntot = tok.agg(count(lit(1)).as("n"))
      sw.join(wtot, Seq("w"))
        .join(broadcast(stot), Seq("source"))
        .crossJoin(broadcast(ntot))
        .select(col("source"), col("n_s"), col("c_sw"),
          round(round(log((col("c_sw") * col("n")).cast("double") /
              (col("n_s") * col("c_w")).cast("double")), 6) * lit(1e6))
            .cast("long").as("lnr_mu"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_tokens"),
          sum(col("c_sw") * col("lnr_mu")).as("kl_mu"))
        .select(col("source"), col("n_tokens"),
          round(col("kl_mu").cast("double") / lit(1e6) / col("n_tokens"), 6)
            .as("kl"))
        .orderBy(col("source"))
    },
    Some(s"""
      |WITH tok AS (
      |  SELECT source, unnest(${Sql.toks()}) AS w FROM documents),
      |sw AS (SELECT source, w, count(*) AS c_sw FROM tok GROUP BY source, w),
      |stot AS (SELECT source, count(*) AS n_s FROM tok GROUP BY source),
      |wtot AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w),
      |ntot AS (SELECT count(*) AS n FROM tok),
      |terms AS (
      |  SELECT source, n_s, c_sw,
      |    CAST(round(round(ln((c_sw * n)::DOUBLE / (n_s * c_w)::DOUBLE), 6)
      |      * 1000000, 0) AS BIGINT) AS lnr_mu
      |  FROM sw JOIN wtot USING (w) JOIN stot USING (source) CROSS JOIN ntot),
      |folded AS (
      |  SELECT source, max(n_s) AS n_tokens,
      |    CAST(sum(c_sw * lnr_mu) AS BIGINT) AS kl_mu
      |  FROM terms GROUP BY source)
      |SELECT source, n_tokens,
      |  round(kl_mu::DOUBLE / 1000000.0 / n_tokens, 6) AS kl
      |FROM folded ORDER BY source
      |""".stripMargin))

  val all: Seq[Q] = Seq(
    q_token_count, q_text_quality, q_gopher_rules, q_lang_id,
    q_doc_fingerprint, q_doc_winnow, q_vocab_growth, q_embed_hash,
    q_tfidf_top_terms, q_doc_chunks, q_doc_pages, q_repetition_ratio,
    q_pmi_bigrams, q_profile_quantiles, q_ngram_novelty, q_unigram_entropy,
    q_source_kl,
    q_quality_percentile_filter, q_strip_markup)
}
