package graft.queries

import graft.core.Tables
import graft.functions.{TextF, VectorF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` / `embeddings`:
  *  - exact (hash-groupBy),
  *  - n-gram Jaccard (blocked pairwise — the verification/oracle path),
  *  - MinHash + LSH banding (the scale path: candidates come from a
  *    band-bucket equi-join, never an O(n²) cross join),
  *  - SimHash signatures,
  *  - embedding-cosine near-dup.
  *
  * Scale notes: the pairwise variants block on low-cardinality keys (lang,
  * label) *plus* a size-band predicate that is mathematically implied by
  * the Jaccard threshold (|A∩B| ≤ min(|A|,|B|) ⇒ J ≥ τ ⇒ τ ≤ |A|/|B| ≤ 1/τ)
  * — it prunes pairs before the expensive intersection without changing
  * the result, so the oracle SQL can omit it. At 100 TB the LSH path is
  * the real plan: signature computation is embarrassingly parallel and the
  * band join shuffles only (band, bucket) keys.
  */
object Dedup {
  import TextF._

  private[graft] val MINHASH_K = 9
  private[graft] val BANDS = 3 // 3 bands × r=3 rows
  private val JACCARD_T = 0.8
  private[graft] val MINHASH_VERIFY_T = 0.7
  private val COSINE_T = 0.45

  /** L2 radius on the unit sphere equivalent to a cosine threshold, plus
    * slack so boundary pairs can't be lost to float noise in the
    * candidate pass (over-generation is free — the exact verify prunes). */
  private[graft] def cosineRadius(cosT: Double): Double =
    math.sqrt(2.0 - 2.0 * cosT) + 0.05

  /** doc_id, lang, distinct 3-shingle set — CACHED. Two reasons, both
    * load-bearing at scale:
    *  - every consumer self-joins this table (both sides of a candidate
    *    join), and without materialization Spark computes the full
    *    text→shingle pipeline once per side;
    *  - worse, the `size(sh) > 0` filter inferred from the downstream
    *    explode is pushed below the projection and predicate pushdown
    *    SUBSTITUTES the whole shingle expression into the condition —
    *    6 re-evaluations per row in the round-1 plan (19 s at sf0.1 for
    *    q_dedup_ngram_jaccard alone). The cache boundary stops the
    *    substitution; filters evaluate against materialized columns.
    * At 100 TB the same role is played by writing the signature/shingle
    * table out (or a shuffle-reuse), not by recomputing per join side.
    * `toks` is likewise bound as a real column so the token split runs
    * once per row rather than once per shingle index. */
  private[queries] def shingleDf(s: SparkSession, dir: String): DataFrame =
    graft.core.Caches.cached(
      Tables.spread(Tables(s, dir, "documents"))
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), col("lang"),
          shingleSet(col("toks"), 3).as("sh"))
        .withColumn("nsh", size(col("sh"))))

  private[queries] val shingleSql =
    s"""SELECT doc_id, lang,
       |    list_distinct(${Sql.shingles3("t")}) AS sh
       |  FROM (SELECT doc_id, lang, ${Sql.toks()} AS t FROM documents)""".stripMargin

  /** [[shingleDf]] over an ARBITRARY document frame (a streaming
    * micro-batch) instead of the at-rest table — same token → distinct
    * 3-shingle pipeline, no cache (a micro-batch is consumed once). */
  private[graft] def shingleOf(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), shingleSet(col("toks"), 3).as("sh"))
      .withColumn("nsh", size(col("sh")))

  /** (doc_id, band, bkey) LSH band keys from a (doc_id, sh, ...) frame —
    * the banding step of [[q_dedup_minhash_lsh]], factored so the
    * streaming twin computes byte-identical keys. */
  private[graft] def bandedOf(withSh: DataFrame): DataFrame = {
    val r = MINHASH_K / BANDS
    withSh.select(col("doc_id"), minhashK(col("sh"), MINHASH_K).as("sig"))
      .select(col("doc_id"),
        posexplode(array((0 until BANDS).map { b =>
          md5(concat_ws(",",
            (0 until r).map(i =>
              element_at(col("sig"), b * r + i + 1).cast("string")): _*))
        }: _*)).as(Seq("band", "bkey")))
  }

  /** Jaccard over two distinct shingle arrays via intersection count only
    * (|A∪B| = |A|+|B|−|A∩B|) — avoids engine-specific union semantics. */
  private[graft] def jaccard(a: Column, b: Column, na: Column, nb: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (na.cast("double") + nb.cast("double") - inter)
  }

  private[queries] def jaccardSql(a: String, b: String) =
    s"(len(list_filter($a, x -> list_contains($b, x)))::DOUBLE / " +
      s"(len($a) + len($b) - len(list_filter($a, x -> list_contains($b, x)))))"

  /** Incremental dedup — the shape a live corpus actually runs: dedup an
    * arriving batch (doc_id % 4 == 0) against the EXISTING corpus (the
    * rest), never corpus-against-itself. A new doc survives iff (a) its
    * exact text hash is absent from the corpus (hash anti-join) and (b)
    * no corpus doc reaches 3-shingle Jaccard ≥ 0.8 against it (bipartite
    * inverted-index count-join on (lang, shingle) — same posting shape
    * as q_dedup_ngram_jaccard, no cross product). Scale: the batch side
    * is a day's crawl ≪ corpus; its postings are the small join side
    * (broadcastable), the corpus postings never self-join, and only
    * (batch_id, corpus_id) count pairs shuffle. Integer/hash domain →
    * oracle-exact. */
  val q_dedup_incremental = Q(
    "q_dedup_incremental",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val hashes = docs.select(col("doc_id"),
        md5(lower(trim(col("text")))).as("h"))
      val exactOk = hashes.filter(col("doc_id") % 4 === 0)
        .join(hashes.filter(col("doc_id") % 4 =!= 0)
          .select(col("h")).distinct(), Seq("h"), "left_anti")
      val d = shingleDf(s, dir)
      val pa = d.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("a"), col("lang"),
          explode(col("sh")).as("tok"), col("nsh").as("na"))
      val pb = d.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("b"), col("lang"),
          explode(col("sh")).as("tok"), col("nsh").as("nb"))
      val near = pa.join(pb, Seq("lang", "tok"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c").cast("double") /
          (col("na") + col("nb") - col("c")) >= JACCARD_T)
        .select(col("a").as("doc_id")).distinct()
      exactOk.join(near, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH sh AS ($shingleSql),
      |hx AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
      |exact_ok AS (
      |  SELECT doc_id FROM hx WHERE doc_id % 4 = 0
      |  AND h NOT IN (SELECT h FROM hx WHERE doc_id % 4 <> 0)),
      |pa AS (SELECT doc_id AS a, lang, unnest(sh) AS tok, len(sh) AS na
      |       FROM sh WHERE doc_id % 4 = 0),
      |pb AS (SELECT doc_id AS b, lang, unnest(sh) AS tok, len(sh) AS nb
      |       FROM sh WHERE doc_id % 4 <> 0),
      |near AS (
      |  SELECT DISTINCT a FROM (
      |    SELECT a, b, na, nb, count(*) AS c
      |    FROM pa JOIN pb USING (lang, tok)
      |    GROUP BY a, b, na, nb)
      |  WHERE c::DOUBLE / (na + nb - c) >= $JACCARD_T)
      |SELECT doc_id FROM exact_ok
      |WHERE doc_id NOT IN (SELECT a FROM near)
      |ORDER BY doc_id
      |""".stripMargin))

  private val incrMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Write the batch and corpus text fingerprints as h-bucketed catalog
    * tables (same bucket count both sides) — memoized per app+dataset so
    * bench/verify loops pay the write once; the dir tag + orphan cleanup
    * follow [[graft.sink.VectorTable.dirTag]]/`dropWithLocation`. */
  private def bucketedFingerprints(s: SparkSession,
      dir: String): (String, String) =
    graft.core.Caches.memoized(s, dir, incrMemo) {
      val tag = graft.sink.VectorTable.dirTag(dir)
      val batchT = s"graft_incr_batch_$tag"
      val corpT = s"graft_incr_corpus_$tag"
      Seq(batchT, corpT)
        .foreach(graft.sink.VectorTable.dropWithLocation(s, _))
      val hashes = Tables(s, dir, "documents")
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      graft.sink.VectorTable.writeBucketed(
        hashes.filter(col("doc_id") % 4 === 0), batchT, "h")
      graft.sink.VectorTable.writeBucketed(
        hashes.filter(col("doc_id") % 4 =!= 0), corpT, "h")
      (batchT, corpT)
    }

  /** [[q_dedup_incremental]] consumed from the BUCKETED at-rest layout
    * (round 12 — the second production consumer of
    * `VectorTable.writeBucketed`, after q_corpus_delta_bucketed): both
    * fingerprint tables are bucketed by the text hash `h` into the same
    * bucket count, so the batch-vs-corpus exact-hash ANTI-join reads
    * co-located buckets and carries NO Exchange keyed on h — at 100 TB
    * the corpus fingerprint table is petabyte-scale and never
    * re-shuffles for a day's batch (PlanShapeSpec pins no
    * hashpartitioning(h) in the plan). The anti-join also drops the
    * shuffled variant's distinct on the corpus side — anti semantics
    * ignore right-side duplicates, so the aggregate was only ever
    * paying for the Exchange it came with. The near-dup half (postings
    * on (lang, shingle)) is unchanged — its keys are not the bucket id.
    * Same oracle as q_dedup_incremental — layout changes the plan,
    * never the answer. */
  val q_dedup_incremental_bucketed = Q(
    "q_dedup_incremental_bucketed",
    (s, dir) => {
      val (batchT, corpT) = bucketedFingerprints(s, dir)
      val exactOk = s.table(batchT)
        .join(s.table(corpT), Seq("h"), "left_anti")
        .select(col("doc_id"))
      val d = shingleDf(s, dir)
      val pa = d.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("a"), col("lang"),
          explode(col("sh")).as("tok"), col("nsh").as("na"))
      val pb = d.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("b"), col("lang"),
          explode(col("sh")).as("tok"), col("nsh").as("nb"))
      val near = pa.join(pb, Seq("lang", "tok"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c").cast("double") /
          (col("na") + col("nb") - col("c")) >= JACCARD_T)
        .select(col("a").as("doc_id")).distinct()
      exactOk.join(near, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH sh AS ($shingleSql),
      |hx AS (SELECT doc_id, md5(lower(trim(text))) AS h FROM documents),
      |exact_ok AS (
      |  SELECT doc_id FROM hx WHERE doc_id % 4 = 0
      |  AND h NOT IN (SELECT h FROM hx WHERE doc_id % 4 <> 0)),
      |pa AS (SELECT doc_id AS a, lang, unnest(sh) AS tok, len(sh) AS na
      |       FROM sh WHERE doc_id % 4 = 0),
      |pb AS (SELECT doc_id AS b, lang, unnest(sh) AS tok, len(sh) AS nb
      |       FROM sh WHERE doc_id % 4 <> 0),
      |near AS (
      |  SELECT DISTINCT a FROM (
      |    SELECT a, b, na, nb, count(*) AS c
      |    FROM pa JOIN pb USING (lang, tok)
      |    GROUP BY a, b, na, nb)
      |  WHERE c::DOUBLE / (na + nb - c) >= $JACCARD_T)
      |SELECT doc_id FROM exact_ok
      |WHERE doc_id NOT IN (SELECT a FROM near)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Span-level exact-substring dedup (the "Deduplicating Training Data
    * Makes Language Models Better" primitive, Lee et al. 2022, done with
    * postings instead of a suffix array): positions whose 5-gram occurs
    * in ≥ 2 distinct documents are flagged, and flagged positions whose
    * token ranges touch (gap ≤ n) merge into maximal spans via
    * gaps-and-islands. Output = (doc, span_start, span_end, n_grams) —
    * the byte ranges a curation pass would cut. Scale: one posting
    * shuffle on gram, the duplicated-gram table is vocabulary-bounded
    * (Zipf ⇒ ≪ corpus, broadcast back), and the span merge is a per-doc
    * window — document payloads never move. Integer-exact → hash-checked. */
  /** Session-cached (doc_id, token-array) view of `documents` — the
    * rebuild side of the span scrub and the source of
    * [[fiveGramPositions]]. */
  private def docTokens(s: SparkSession, dir: String): DataFrame =
    graft.core.Caches.cached(
      Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("t")))

  /** Session-cached (doc_id, pos, gram) 5-gram position postings —
    * shared by [[q_dedup_spans]] (the report) and
    * [[q_dedup_scrub_spans]] (the rewrite), so the posting build is
    * paid once per session. */
  private def fiveGramPositions(s: SparkSession, dir: String): DataFrame =
    graft.core.Caches.cached(
      docTokens(s, dir)
        .select(col("doc_id"),
          posexplode(shingles(col("t"), 5)).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("gram")))

  val q_dedup_spans = Q(
    "q_dedup_spans",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val n = 5
      val g = fiveGramPositions(s, dir)
      val dup = g.select(col("gram"), col("doc_id")).distinct()
        .groupBy(col("gram")).agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2).select(col("gram"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val cum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.join(dup, Seq("gram"))
        .select(col("doc_id"), col("pos"))
        .withColumn("prev", lag(col("pos"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("pos") > col("prev") + n, 1L).otherwise(0L))
        .withColumn("isl", sum(col("brk")).over(cum))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("pos")).as("span_start"),
          (max(col("pos")) + (n - 1)).as("span_end"),
          count(lit(1)).as("n_grams"))
        .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
        .orderBy(col("doc_id"), col("span_start"))
    },
    Some(s"""
      |WITH toksrc AS (SELECT doc_id, ${Sql.toks()} AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS gram
      |  FROM toksrc, unnest(range(1, greatest(len(t) - 3, 1))) AS u(i)
      |  WHERE len(t) >= 5),
      |dup AS (SELECT gram FROM (
      |  SELECT gram, count(DISTINCT doc_id) AS nd FROM pos GROUP BY gram)
      |  WHERE nd >= 2),
      |hits AS (SELECT doc_id, pos FROM pos JOIN dup USING (gram)),
      |brks AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 5
      |         THEN 1 ELSE 0 END AS brk
      |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |grp AS (SELECT doc_id, pos,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS UNBOUNDED PRECEDING) AS isl
      |  FROM brks)
      |SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
      |  count(*) AS n_grams
      |FROM grp GROUP BY doc_id, isl
      |ORDER BY doc_id, span_start
      |""".stripMargin))

  /** The span-scrub kernel of [[q_dedup_scrub_spans]] (and the
    * `scrub_spans` registry verb): input = (idCol, t token-array),
    * output = input plus a `kept` token-array column — the tokens that
    * survive the global keeper rule. Pass `grams` to reuse an existing
    * (idCol, pos long, gram) posting frame (the query shares the
    * session-cached 5-gram postings with [[q_dedup_spans]]); otherwise
    * the postings derive from `bound` itself. */
  private[graft] def scrubSpans(bound: DataFrame, idCol: String,
      n: Int = 5, grams: Option[DataFrame] = None): DataFrame = {
    val id = col(idCol)
    val g = grams.getOrElse(
      bound.select(id, posexplode(shingles(col("t"), n)).as(Seq("pos", "gram")))
        .select(id, col("pos").cast("long").as("pos"), col("gram")))
    val keep = g.select(col("gram"), id).distinct()
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("nd"), min(id).as("keep_id"))
      .filter(col("nd") >= 2)
      .select(col("gram"), col("keep_id"))
    val cov = g.join(keep, Seq("gram"))
      .filter(id =!= col("keep_id"))
      .select(id,
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("i"))
      .groupBy(id).agg(collect_set(col("i")).as("cov"))
    bound.join(cov, Seq(idCol), "left")
      .withColumn("kept",
        when(col("cov").isNull, col("t"))
          .otherwise(filter(col("t"),
            (_: Column, i: Column) =>
              !array_contains(col("cov"), i.cast("long")))))
      .drop("cov")
  }

  /** GLOBAL span scrub — the REWRITE stage downstream of
    * [[q_dedup_spans]]'s report (the C4/RefinedWeb curation step: cut the
    * duplicated span from every copy but one, keep the rest of the doc).
    * Every 5-gram occurring in ≥ 2 distinct documents designates the
    * lowest-doc_id document containing it as the keeper; in every OTHER
    * document the token positions covered by that gram's occurrences are
    * dropped, and each document is re-emitted as (kept-token hash,
    * before/dropped counts) — the verifiable fingerprint of the rewritten
    * corpus. The reference stops at reporting duplicates
    * (radient/tasks/sinks/local/gann.py stores, never rewrites); the
    * rewrite is what a training-data pipeline actually ships.
    *
    * Scale shape: the gram postings shuffle once on gram (shared,
    * session-cached with the spans report); the keeper table is
    * vocabulary-bounded (Zipf ⇒ ≪ corpus); covered positions collapse to
    * one array per affected doc (collect_set over ≤ |doc| ints, bounded
    * by document size, not corpus size); and the rewrite itself is a
    * narrow per-row array filter — document payloads move through exactly
    * one equi-join on doc_id. Integer/hash-exact → hash-checked. */
  val q_dedup_scrub_spans = Q(
    "q_dedup_scrub_spans",
    (s, dir) => {
      scrubSpans(docTokens(s, dir), "doc_id",
        grams = Some(fiveGramPositions(s, dir)))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_before"),
          (size(col("t")) - size(col("kept"))).cast("long").as("n_dropped"),
          h60(concat_ws(" ", col("kept"))).as("clean_h"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH toksrc AS (SELECT doc_id, ${Sql.toks()} AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]) AS gram
      |  FROM toksrc, unnest(range(1, greatest(len(t) - 3, 1))) AS u(i)
      |  WHERE len(t) >= 5),
      |keepg AS (
      |  SELECT gram, min(doc_id) AS keep_id
      |  FROM (SELECT DISTINCT gram, doc_id FROM pos)
      |  GROUP BY gram HAVING count(*) >= 2),
      |cov AS (
      |  SELECT doc_id, list(DISTINCT pos + o) AS cov
      |  FROM pos JOIN keepg USING (gram), unnest(range(0, 5)) AS ofs(o)
      |  WHERE doc_id <> keep_id
      |  GROUP BY doc_id),
      |clean AS (
      |  SELECT t.doc_id, t.t,
      |    CASE WHEN c.cov IS NULL THEN t.t
      |         ELSE list_transform(
      |            list_filter(range(1, len(t.t) + 1),
      |              i -> NOT list_contains(c.cov, CAST(i - 1 AS BIGINT))),
      |            i -> t.t[i])
      |    END AS kept
      |  FROM toksrc t LEFT JOIN cov c USING (doc_id))
      |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_before,
      |  CAST(len(t) - len(kept) AS BIGINT) AS n_dropped,
      |  ${Sql.h60("coalesce(array_to_string(kept, ' '), '')")} AS clean_h
      |FROM clean ORDER BY doc_id
      |""".stripMargin))

  val q_dedup_exact = Q(
    "q_dedup_exact",
    (s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(lower(trim(col("text")))).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },
    Some("""
      |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(lower(trim(text)))
      |ORDER BY keep_id
      |""".stripMargin))

  val q_dedup_ngram_jaccard = Q(
    "q_dedup_ngram_jaccard",
    (s, dir) => {
      // Inverted-index set-similarity join via SetSimJoin.jaccardJoin
      // (round 12 — cost-based): postings equi-join on (lang, shingle)
      // + common-element count, no same-lang cross product, no array
      // payloads in the shuffle (the round-1 pairwise plan took 50 s at
      // sf0.1). The Auto selector reads the exact raw-join row count
      // and runs countJoin here (0.3-2.5 rows/posting, no hot
      // shingles); the PPJoin prefix-filtered strategy swaps in
      // AUTOMATICALLY on skewed corpora where hot shingles blow up
      // posting lists — identical results either way (SetSimJoinSpec).
      graft.dedup.SetSimJoin.jaccardJoin(
          shingleDf(s, dir), "doc_id", "lang", "sh", "nsh", JACCARD_T)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      |WITH sh AS ($shingleSql)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  ${jaccardSql("a.sh", "b.sh")} AS jaccard
      |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE ${jaccardSql("a.sh", "b.sh")} >= $JACCARD_T
      |ORDER BY doc_a, doc_b
      |""".stripMargin))

  /** CONTAINMENT dedup (round 10) — the asymmetric relation Jaccard
    * misses: doc a is contained in doc b when ≥80% of a's distinct
    * 3-shingles appear in b (|A∩B| / |A| ≥ 0.8), the quote-inclusion /
    * boilerplate-wrapper case (a short doc fully quoted inside a longer
    * one scores low Jaccard — the union is dominated by b — but
    * containment 1.0; RefinedWeb-style pipelines check both). Same
    * inverted-index shape as [[q_dedup_ngram_jaccard]]: postings
    * equi-join on (lang, shingle) off the SHARED cached shingle table,
    * only (a, b) count pairs shuffle, no same-lang cross product, and
    * the threshold is an integer cross-multiplication (c·10 ≥ |A|·8) so
    * no float boundary can disagree between engines. Docs under 5
    * shingles are excluded — a 1-shingle doc is "contained" everywhere
    * and the relation degenerates. Ordered pairs: mutual containment
    * emits both directions (that is the point of the asymmetry).
    * Scale (round 11, cost-based round 12): the entry delegates to
    * [[graft.dedup.SetSimJoin.containmentJoin]] with Strategy.Auto — one
    * posting aggregate reads the exact raw-join row count and selects
    * the raw posting join when it is provably ≤16 rows/posting (this
    * corpus: 0.3–2.5, so raw runs and the round-11 2× prefix premium is
    * recovered), or the ONE-SIDED df-ranked prefix filter when a hot
    * shingle would make raw quadratic — the a side then posts only its
    * ⌊(1−τ)·|A|⌋+1 rarest-by-df shingles, so a shingle shared by m docs
    * contributes O(m) join rows instead of m². Both strategies end in
    * the same integer cross-multiply, so the result (and oracle hash)
    * is strategy-independent — SetSimJoinSpec pins the equivalence in
    * both directions of a mutual-containment fixture and on a planted
    * hot shingle; PlanShapeSpec pins both sanctioned plans. */
  val q_dedup_containment = Q(
    "q_dedup_containment",
    (s, dir) => {
      val d = shingleDf(s, dir).filter(col("nsh") >= 5)
      graft.dedup.SetSimJoin
        .containmentJoin(d, "doc_id", "lang", "sh", "nsh", 8, 10)
        .select(col("id_a").as("a"), col("id_b").as("b"),
          col("n_shared"), col("na"))
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      |WITH sh AS ($shingleSql),
      |f AS (SELECT doc_id, lang, sh FROM sh WHERE len(sh) >= 5)
      |SELECT a.doc_id AS a, b.doc_id AS b,
      |  CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS BIGINT)
      |    AS n_shared,
      |  CAST(len(a.sh) AS BIGINT) AS na
      |FROM f a JOIN f b ON a.lang = b.lang AND a.doc_id <> b.doc_id
      |WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 10
      |      >= len(a.sh) * 8
      |ORDER BY a, b
      |""".stripMargin))

  /** MinHash signatures (k=9) — integer-exact oracle check of the
    * signature computation itself. */
  val q_minhash_signatures = Q(
    "q_minhash_signatures",
    (s, dir) => {
      val d = shingleDf(s, dir)
      // ONE native-kernel signature pass; the component columns are plain
      // element_at projections of the bound array column
      d.select(col("doc_id"), minhashK(col("sh"), MINHASH_K).as("mhs"))
        .select(col("doc_id") +:
          (0 until MINHASH_K).map(j =>
            element_at(col("mhs"), j + 1).as(s"mh$j")): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val cols = (0 until MINHASH_K).map(j => s"${Sql.minhash("sh", j)} AS mh$j")
      s"""
      |WITH sh AS ($shingleSql)
      |SELECT doc_id, ${cols.mkString(",\n  ")}
      |FROM sh ORDER BY doc_id
      |""".stripMargin
    })

  /** Full MinHash+LSH dedup: band signatures → bucket equi-join →
    * Jaccard-verified pairs. The join key is (band index, md5 of r
    * signature components) so only colliding docs ever meet. */
  val q_dedup_minhash_lsh = Q(
    "q_dedup_minhash_lsh",
    (s, dir) => {
      val d = shingleDf(s, dir)
      // cached: both band-join sides derive from sig, and the 9-way
      // minhash aggregate must not be recomputed per side / re-inlined
      // into pushed-down filters (see shingleDf note)
      val sig = graft.core.Caches.cached(
        d.select(col("doc_id"), minhashK(col("sh"), MINHASH_K).as("sig")))
      val r = MINHASH_K / BANDS
      // band join and pair-dedup run over ids ONLY — the shingle arrays
      // join back in just for the (few) surviving candidate pairs, so the
      // band shuffle and the distinct never move array payloads (the
      // round-1 plan distinct-ed over full shingle arrays: 17.7 s at sf0.1)
      val banded = sig.select(col("doc_id"),
        posexplode(array((0 until BANDS).map { b =>
          md5(concat_ws(",",
            (0 until r).map(i => element_at(col("sig"), b * r + i + 1).cast("string")): _*))
        }: _*)).as(Seq("band", "bkey")))
      val a = banded.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
      val b = banded.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
      val pairs = a.join(b, Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      val sa = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("nsh").as("na"))
      val sb = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("nsh").as("nb"))
      pairs.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          jaccard(col("sh_a"), col("sh_b"), col("na"), col("nb")).as("jaccard"))
        .filter(col("jaccard") >= MINHASH_VERIFY_T)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val r = MINHASH_K / BANDS
      val bandSelects = (0 until BANDS).map { b =>
        val parts = (0 until r).map(i => s"sig[${b * r + i + 1}]::VARCHAR")
        s"SELECT doc_id, sh, $b AS band, md5(${parts.mkString(" || ',' || ")}) AS bkey FROM sig"
      }
      val sigList = (0 until MINHASH_K).map(j => Sql.minhash("sh", j)).mkString(", ")
      s"""
      |WITH shs AS ($shingleSql),
      |sig AS (SELECT doc_id, sh, [$sigList] AS sig FROM shs),
      |banded AS (
      |  ${bandSelects.mkString("\n  UNION ALL ")}
      |),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.sh AS sh_a, b.sh AS sh_b
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, ${jaccardSql("sh_a", "sh_b")} AS jaccard
      |FROM pairs
      |WHERE ${jaccardSql("sh_a", "sh_b")} >= $MINHASH_VERIFY_T
      |ORDER BY doc_a, doc_b
      |""".stripMargin
    })

  /** Embedding near-dup at τ=0.45 — SPEC-ONLY since round 9 (not in
    * [[all]], so not an oracle entry): at this τ the threshold sits
    * INSIDE the testdata's background cosine continuum, so the true pair
    * set itself grows quadratically with the corpus and ANY exact method
    * must examine ~all near-threshold pairs — measured 27× wall-time at
    * 10× data (SCALE.md). No implementation can fix an operator whose
    * OUTPUT is quadratic; the production-margin regimes that do scale
    * are the registered [[q_dedup_embedding_tight]] (SignLsh banding,
    * τ=0.9) and [[q_dedup_semantic]] (cluster-scoped verify). Kept as a
    * callable Q because EmbeddingDedupSpec uses it as the dense-regime
    * recall oracle: candidates from `LshJoin.l2SelfJoin` over UNIT
    * vectors — on the unit sphere cos(a,b) ≥ τ ⇔ ‖â−b̂‖ ≤ √(2−2τ) — then
    * exact double-fold cosine verify on the ORIGINAL vectors, pinned
    * equal to the brute-force all-pairs set, with no cross join in the
    * plan (also pinned there). */
  val q_dedup_embedding = Q(
    "q_dedup_embedding",
    (s, dir) => {
      // precompute norms once per side (gann.c:832-841 trick); cached:
      // candidate generation + both verify sides derive from it
      val e = graft.core.Caches.cached(
        Tables.spread(Tables(s, dir, "embeddings"))
          .select(col("vec_id"), col("embedding"),
            VectorF.l2Norm(col("embedding")).as("nrm")))
      val unit = e.select(col("vec_id"),
        VectorF.normalize(col("embedding")).as("u"))
      val cand = graft.index.LshJoin.l2SelfJoin(
          unit, "vec_id", "u", threshold = cosineRadius(COSINE_T),
          numTables = 8, memoKey = Some(s"dedup_embedding#$dir"))
        .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"))
        .distinct()
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("nrma"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nrmb"))
      cand.join(a, Seq("vec_a")).join(b, Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(VectorF.cosinePre(VectorF.dot(col("ea"), col("eb")),
            col("nrma"), col("nrmb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= COSINE_T)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some(s"""
      |WITH n AS (SELECT vec_id, embedding, ${Sql.norm("embedding")} AS nrm FROM embeddings)
      |SELECT vec_a, vec_b, cos_sim FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(${Sql.dotd("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_sim
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |WHERE cos_sim >= $COSINE_T
      |ORDER BY vec_a, vec_b
      |""".stripMargin))

  private val TIGHT_T = 0.9

  /** Embedding near-dup in the PRODUCTION threshold regime (τ = 0.9) —
    * the 100 TB companion to [[q_dedup_embedding]]. The testdata
    * embeddings are near-uniform (max background cosine ≈ 0.51), so the
    * entry plants its true pairs deterministically IN-QUERY: each vector
    * gets a twin (vec_id + 1 000 000, divisible by 8 so id%8 is stable)
    * with dimensions `i % 8 == vec_id % 8` zeroed — cos(v, twin) =
    * ‖v_kept‖/‖v‖ ≈ √(7/8) ≈ 0.935, a construction both engines express
    * exactly (arithmetic only, no RNG), so unlike an approximate entry
    * this one is fully DuckDB-hash-checked with non-trivial output.
    *
    * Candidates come from [[graft.index.SignLsh]] (AND-bits/OR-bands
    * hyperplane signs, a bucketed (band, key) equi-join); every candidate
    * is exact-verified with the double-fold cosine on the constructed
    * vectors, so precision is exact by construction and recall of the
    * fixed-seed generator is pinned by this oracle plus SignLshSpec.
    * Contrast with q_dedup_embedding's τ = 0.45: THERE the threshold sits
    * inside the background continuum (zero margin), exactness forces
    * all-pairs verification, and the cost is inherently quadratic; at a
    * production margin (θ_true ≤ 26° vs ≈ 90° background) the banded join
    * does bucket-local work — the measured 10× scale ratios for both
    * regimes are recorded in SCALE.md. */
  val q_dedup_embedding_tight = Q(
    "q_dedup_embedding_tight",
    (s, dir) => {
      val base = Tables.spread(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val twin = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("e"), (x, i) =>
          when(pmod(i, lit(8)) === pmod(col("vec_id"), lit(8)), lit(0.0))
            .otherwise(x)).as("e"))
      val corpus = graft.core.Caches.cached(
        base.unionByName(twin)
          .withColumn("nrm", VectorF.l2Norm(col("e"))))
      val cand = graft.index.SignLsh.candidatePairs(
        corpus, "vec_id", "e",
        memoKey = Some(s"dedup_embedding_tight#$dir"))
      val a = corpus.select(col("vec_id").as("vec_id_a"), col("e").as("ea"),
        col("nrm").as("nrma"))
      val b = corpus.select(col("vec_id").as("vec_id_b"), col("e").as("eb"),
        col("nrm").as("nrmb"))
      cand.join(a, Seq("vec_id_a")).join(b, Seq("vec_id_b"))
        .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"),
          round(VectorF.cosinePre(VectorF.dot(col("ea"), col("eb")),
            col("nrma"), col("nrmb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= TIGHT_T)
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some(s"""
      |WITH c AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(range(1, len(embedding)+1),
      |      i -> CASE WHEN (i-1) % 8 = vec_id % 8 THEN 0.0
      |           ELSE embedding[i]::DOUBLE END)
      |  FROM embeddings),
      |n AS (SELECT vec_id, e, ${Sql.norm("e")} AS nrm FROM c)
      |SELECT vec_a, vec_b, cos_sim FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(${Sql.dotd("a.e", "b.e")} / (a.nrm * b.nrm), 6) AS cos_sim
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |WHERE cos_sim >= $TIGHT_T
      |ORDER BY vec_a, vec_b
      |""".stripMargin))

  /** SimHash near-dup: 60-bit TF-weighted SimHash signatures, pairs with
    * Hamming distance ≤ 3. Candidate generation is banded over 4 disjoint
    * 15-bit bands (pigeonhole: d ≤ 3 over 4 disjoint bands ⇒ at least one
    * band is identical), so the Spark plan only equi-joins on (band, key)
    * and XOR-verifies the few collisions — the oracle states the same set
    * pairwise. 15-bit bands collide ~128× less often than the earlier
    * 8-bit bytes of a 32-bit signature (~2.8 M candidate pairs → ~40 K at
    * sf0.1) while the md5-per-token signature pass costs the same. At
    * 100 TB the signature pass is embarrassingly parallel and the band
    * join shuffles 15-bit keys. */
  /** SimHash near-dup pair set (doc_a, doc_b, hamming ≤ 3), banded —
    * shared by q_dedup_simhash (which just orders it) and
    * q_dedup_components (which clusters it). */
  private def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val HAMMING_T = 3
    // cached for the same reasons as shingleDf: self-joined, and the
    // 61-HOF simhash expression must not be re-inlined by pushdown
    val sim = graft.core.Caches.cached(
      Tables.spread(Tables(s, dir, "documents"))
        .withColumn("t", tokens(col("text")))
        .select(col("doc_id"), simhash(col("t")).as("sh")))
    val banded = sim.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sh"), 15 * b).bitwiseAND(0x7fff)): _*))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      col("band"), col("bkey"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        VectorF.hammingDist(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      // verify BEFORE the pair-dedup: the XOR popcount is a per-row int
      // op, so filtering first shrinks the distinct's shuffle from every
      // band collision (~2.8M at sf0.1) to just the qualifying pairs
      .filter(col("hamming") <= HAMMING_T)
      .distinct()
  }

  val q_dedup_simhash = Q(
    "q_dedup_simhash",
    (s, dir) => simhashPairs(s, dir).orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      |WITH s AS (
      |  SELECT doc_id, ${Sql.simhash60("t")} AS sh
      |  FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY doc_a, doc_b
      |""".stripMargin))

  private def simhash(toks: Column) = TextF.simhash60(toks)

  /** Duplicate-cluster keeper assignment: connected components over the
    * SimHash near-dup pair set, every document labelled with the smallest
    * doc_id of its duplicate cluster (keep_id == doc_id ⇒ the kept copy)
    * plus the cluster size — the "collapse duplicate groups to one
    * representative" step a training corpus runs after pair mining. The
    * DuckDB oracle states the same fixpoint as a recursive CTE
    * (reachability → min reachable id), so the distributed label
    * propagation in [[graft.dedup.ConnectedComponents]] is hash-checked
    * exactly, not rows-only. */
  val q_dedup_components = Q(
    "q_dedup_components",
    (s, dir) => {
      val pairs = simhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
      val comp = graft.dedup.ConnectedComponents
        .components(pairs, "doc_a", "doc_b")
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      // singletons (no near-dup pair) keep themselves
      val labelled = docs
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("keep_id"))
      labelled
        .withColumn("csize",
          count(lit(1)).over(Window.partitionBy(col("keep_id"))))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH RECURSIVE s AS (
      |  SELECT doc_id, ${Sql.simhash60("t")} AS sh
      |  FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p
      |      UNION ALL SELECT doc_b, doc_a FROM p),
      |reach(u, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.u),
      |comp AS (SELECT u AS doc_id, min(r) AS keep_id FROM reach GROUP BY u)
      |SELECT doc_id, keep_id,
      |  count(*) OVER (PARTITION BY keep_id) AS csize
      |FROM comp ORDER BY doc_id
      |""".stripMargin))

  /** Duplicate-cluster size histogram: how many clusters have exactly k
    * members (singletons included) — the dedup-rate diagnostic a curation
    * run reads before deciding thresholds (a heavy tail here means the
    * corpus has template spam; all-singletons means the threshold is too
    * tight). Same component fixpoint as q_dedup_components, then two
    * integer-exact aggregates; output is O(max cluster size) rows.
    * At 100 TB nothing beyond the component labels (id, keep_id) ever
    * shuffles — the histogram inputs are (keep_id, count) pairs. */
  val q_dedup_cluster_sizes = Q(
    "q_dedup_cluster_sizes",
    (s, dir) => {
      val pairs = simhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
      val comp = graft.dedup.ConnectedComponents
        .components(pairs, "doc_a", "doc_b")
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      docs
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(coalesce(col("comp"), col("doc_id")).as("keep_id"))
        .groupBy(col("keep_id")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("csize"))
    },
    Some(s"""
      |WITH RECURSIVE s AS (
      |  SELECT doc_id, ${Sql.simhash60("t")} AS sh
      |  FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p
      |      UNION ALL SELECT doc_b, doc_a FROM p),
      |reach(u, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.u),
      |comp AS (SELECT u AS doc_id, min(r) AS keep_id FROM reach GROUP BY u),
      |cs AS (SELECT keep_id, count(*) AS csize FROM comp GROUP BY keep_id)
      |SELECT csize, count(*) AS n_clusters
      |FROM cs GROUP BY csize ORDER BY csize
      |""".stripMargin))

  /** Quality-weighted keeper selection: the same duplicate clusters as
    * [[q_dedup_components]], but the kept representative is the BEST
    * document of each cluster (longest `n_chars`, ties to the smaller
    * doc_id) instead of the smallest id — the policy curation pipelines
    * actually run ("keep the most complete copy"; min-id keeps whichever
    * crawl happened to be ingested first, which for truncated or
    * boilerplate-heavy duplicates is often the worst copy). Composes two
    * oracle-checked families: the connected-components fixpoint supplies
    * the cluster label, a per-cluster ordered window picks the argmax.
    * Scale: only (id, label) and (id, n_chars) narrow rows shuffle; the
    * keeper window partitions by cluster, so each sort is bounded by
    * cluster size (the same skew bound as the cluster-size histogram). */
  val q_dedup_keep_best = Q(
    "q_dedup_keep_best",
    (s, dir) => {
      val pairs = simhashPairs(s, dir).select(col("doc_a"), col("doc_b"))
      val comp = graft.dedup.ConnectedComponents
        .components(pairs, "doc_a", "doc_b")
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val labelled = docs
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("comp"), col("doc_id")).as("cluster"))
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      labelled
        .withColumn("best_id", first(col("doc_id")).over(w))
        .select(col("doc_id"), col("cluster"), col("best_id"),
          (col("doc_id") === col("best_id")).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH RECURSIVE s AS (
      |  SELECT doc_id, ${Sql.simhash60("t")} AS sh
      |  FROM (SELECT doc_id, ${Sql.toks()} AS t FROM documents)),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM s a JOIN s b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sh, b.sh)) <= 3),
      |e AS (SELECT doc_a AS u, doc_b AS v FROM p
      |      UNION ALL SELECT doc_b, doc_a FROM p),
      |reach(u, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.v, reach.r FROM reach JOIN e ON e.u = reach.u),
      |comp AS (SELECT u AS doc_id, min(r) AS cluster FROM reach GROUP BY u)
      |SELECT doc_id, cluster, best_id, doc_id = best_id AS kept
      |FROM (
      |  SELECT d.doc_id, comp.cluster,
      |    first_value(d.doc_id) OVER (
      |      PARTITION BY comp.cluster ORDER BY d.n_chars DESC, d.doc_id) AS best_id
      |  FROM documents d JOIN comp ON comp.doc_id = d.doc_id)
      |ORDER BY doc_id
      |""".stripMargin))

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023: cluster the
    * embeddings, then search for near-dups only WITHIN each cluster):
    * every vector hard-assigns to its nearest of 8 fixed deterministic
    * centroids (vec_id < 8 seeds — the q_cluster_assign shape), and the
    * pairwise cosine verify runs per cluster instead of globally. The
    * cluster scoping is the method's approximation — cross-cluster dups
    * are deliberately out of scope — and the oracle states the SAME
    * scoped semantics, so the entry is hash-exact including any twin
    * that lands across a cluster boundary from its source.
    *
    * Same planted-twin corpus as [[q_dedup_embedding_tight]] (the raw
    * testdata has no true near-dups). Scale shape: assignment is a
    * narrow broadcast-argmin pass; the per-cluster pair join is the
    * quadratic-in-cluster-size trade SemDeDup makes (k clusters cut
    * pair volume by ~k vs all-pairs); at 100 TB k grows with the corpus
    * so cluster populations stay bounded, and the verify stays
    * bucket-local exactly like the SignLsh path. */
  val q_dedup_semantic = Q(
    "q_dedup_semantic",
    (s, dir) => {
      val base = Tables.spread(Tables(s, dir, "embeddings"))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val twin = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("e"), (x, i) =>
          when(pmod(i, lit(8)) === pmod(col("vec_id"), lit(8)), lit(0.0))
            .otherwise(x)).as("e"))
      val corpus = graft.core.Caches.cached(
        base.unionByName(twin)
          .withColumn("nrm", VectorF.l2Norm(col("e"))))
      val cents = corpus.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("e").as("cv"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdist"), col("cid"))
      val assigned = graft.core.Caches.cached(corpus
        .crossJoin(broadcast(cents))
        .withColumn("cdist", VectorF.l2Dist(col("e"), col("cv")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("vec_id"), col("cid").as("cluster"), col("e"), col("nrm")))
      val a = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
        col("e").as("ea"), col("nrm").as("nrma"))
      val b = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
        col("e").as("eb"), col("nrm").as("nrmb"))
      a.join(b, Seq("cluster"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("cluster"), col("vec_a"), col("vec_b"),
          round(VectorF.cosinePre(VectorF.dot(col("ea"), col("eb")),
            col("nrma"), col("nrmb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= TIGHT_T)
        .orderBy(col("cluster"), col("vec_a"), col("vec_b"))
    },
    Some(s"""
      |WITH c AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000,
      |    list_transform(range(1, len(embedding)+1),
      |      i -> CASE WHEN (i-1) % 8 = vec_id % 8 THEN 0.0
      |           ELSE embedding[i]::DOUBLE END)
      |  FROM embeddings),
      |n AS (SELECT vec_id, e, ${Sql.norm("e")} AS nrm FROM c),
      |cents AS (SELECT vec_id AS cid, e AS cv FROM n WHERE vec_id < 8),
      |asg AS (
      |  SELECT vec_id, cluster, e, nrm FROM (
      |    SELECT n.vec_id, cents.cid AS cluster, n.e, n.nrm,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        ${Sql.l2("n.e", "cents.cv")}, cents.cid) AS rnk
      |    FROM n, cents)
      |  WHERE rnk = 1)
      |SELECT cluster, vec_a, vec_b, cos_sim FROM (
      |  SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(${Sql.dotd("a.e", "b.e")} / (a.nrm * b.nrm), 6) AS cos_sim
      |  FROM asg a JOIN asg b
      |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
      |WHERE cos_sim >= $TIGHT_T
      |ORDER BY cluster, vec_a, vec_b
      |""".stripMargin))

  // q_dedup_embedding (the τ=0.45 dense regime) is deliberately NOT
  // registered — spec-only, see its scaladoc
  /** Partial-overlap candidate pairs from winnowing fingerprints
    * ([[TextAnalysis.q_doc_winnow]]'s consumer — the MOSS match step):
    * documents sharing ≥ 2 selected fingerprints, with the shared count
    * as the match strength. The winnowing guarantee makes this the
    * detector for QUOTED RUNS (any shared ≥8-token run plants a common
    * fingerprint), the overlap class between exact dedup (whole text)
    * and containment (whole shingle set).
    *
    * Scale shape: an id-only posting equi-join on fp — the same bucketed
    * pattern as every dedup join here — behind the standard MOSS "drop
    * very common fingerprints" cut (df ≤ 50): a boilerplate fingerprint
    * shared by m documents would otherwise emit m² candidate pairs, the
    * exact blow-up the containment entry's planted-hot-shingle fixture
    * measures; the df cap bounds pairs-per-fingerprint at 50² and drops
    * only fingerprints that have stopped being discriminative. The cut
    * is applied identically in the oracle, so the hash check covers it. */
  val q_dedup_winnow = Q(
    "q_dedup_winnow",
    (s, dir) => {
      // cache the fingerprint table: it feeds THREE plan branches (the
      // df aggregate + both join sides), and recomputing the shingle-md5
      // pipeline per branch is the dominant cost, not the join (the
      // same reuse boundary as the minhash signature cache)
      val fps = graft.core.Caches.cached(TextAnalysis.winnowFps(
        Tables.spread(Tables(s, dir, "documents"))))
      val rare = fps.groupBy(col("fp"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= 50)
        .select(col("fp"))
      val kept = fps.join(rare, Seq("fp"), "left_semi")
      val a = kept.select(col("doc_id").as("a"), col("fp"))
      val b = kept.select(col("doc_id").as("b"), col("fp"))
      a.join(b, Seq("fp")).filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy(col("a"), col("b"))
    },
    Some(s"""
      |WITH ${TextAnalysis.winnowSql},
      |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
      |kept AS (SELECT doc_id, fp FROM fps JOIN rare USING (fp))
      |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
      |FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
      |GROUP BY x.doc_id, y.doc_id
      |HAVING count(*) >= 2
      |ORDER BY a, b
      |""".stripMargin))

  val all: Seq[Q] = Seq(
    q_dedup_incremental, q_dedup_incremental_bucketed, q_dedup_spans,
    q_dedup_scrub_spans,
    q_dedup_exact, q_dedup_ngram_jaccard, q_dedup_containment,
    q_minhash_signatures,
    q_dedup_minhash_lsh, q_dedup_embedding_tight,
    q_dedup_semantic,
    q_dedup_simhash, q_dedup_winnow,
    q_dedup_components, q_dedup_cluster_sizes, q_dedup_keep_best)
}
