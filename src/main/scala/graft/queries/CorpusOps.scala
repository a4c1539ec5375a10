package graft.queries

import graft.core.{Caches, Tables}
import graft.functions.TextF
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Corpus-maintenance operators — the recurring-pipeline half of curation
  * that [[Corpus]]'s one-shot filters don't cover: sketch-guarded heavy
  * hitters over a vocabulary too large to shuffle, and snapshot-delta
  * classification between two crawls of the same corpus.
  */
object CorpusOps {
  import TextF._

  /** Frequent 3-grams via a Count-Min-Sketch candidate pass + exact
    * verify — the frequent-items operator (output exactly the grams
    * occurring ≥ 5 times, the duplicated-boilerplate detector) in the
    * regime where [[Corpus.q_ngram_topk]]'s plain groupBy stops scaling:
    * distinct n-grams grow with corpus size (not Zipf-bounded like the
    * unigram vocabulary), so a full groupBy(gram) shuffles nearly the
    * whole occurrence stream. Here the first pass merges FIXED-size CMS
    * partials (map-side combine of ~1 MB blobs; the driver holds one
    * sketch, never a vocabulary), the sketch broadcasts back as an
    * occurrence-stream filter, and only the surviving candidate
    * occurrences reach the exact groupBy. CMS never under-counts, so
    * the candidate set is a superset of the true frequent grams and the
    * exact pass makes the output hash-identical to the brute-force
    * oracle (CorpusOpsSpec pins the superset property; both sketch
    * sides go through the binary code path so Spark's agg and the probe
    * hash the same bytes). In production the threshold is ⌈φN⌉ and eps
    * trades sketch size (width·depth·8 B per partial through the merge)
    * against candidate pruning; the fixture's synthetic text has no
    * φN-frequent gram at any φ that survives scale-up, so the entry
    * pins the absolute-count form. */
  /** The engine form behind [[q_heavy_hitters]] and the
    * `frequent_grams` workflow operator: exact counts of every token
    * n-gram occurring ≥ `minCount` times, with the full gram vocabulary
    * never shuffling (CMS candidate pass + exact count of survivors). */
  def frequentGrams(docs: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int, minCount: Long, eps: Double = 0.0): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    // eps <= 0 → auto-size the sketch from the input's plan-time size
    // statistics (the Tables.spread discipline): distinct n-grams are
    // bounded by token occurrences ≈ bytes/~6 chars, and holding width
    // near a quarter of that keeps per-cell load — and with it the
    // over-estimate that admits false candidates into the exact pass —
    // flat as the corpus grows (measured: the fixed-width form degraded
    // the 10× ratio to 4.4×, SCALE.md). Bounds: 2^15 cells ≈ 1.3 MB
    // sketch floor, 2^22 ≈ 168 MB ceiling per 5-row sketch — past that,
    // raise minCount or tree-merge the partials instead. Any width is
    // CORRECT (CMS never under-counts; false candidates die in the
    // exact count) — the knob only trades sketch size vs pruning.
    val epsEff = if (eps > 0) eps else {
      val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
      val width = math.min((1L << 22).toDouble,
        math.max((1L << 15).toDouble, bytes / 24.0))
      2.0 / width
    }
    // cached (tracked): the gram stream feeds the sketch pass and the
    // candidate pass
    val grams = Caches.cached(
      docs.withColumn("_t", tokens(col(textCol)))
        .select(explode(shingles(col("_t"), n)).as("gram")))
    val skBytes = grams
      .select(count_min_sketch(col("gram").cast("binary"),
        lit(epsEff), lit(0.99d), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val bc = s.sparkContext.broadcast(skBytes)
    val isCandidate = udf { (g: String) =>
      // deserialize once per executor (memoized by blob identity —
      // readFrom per row would dominate the probe)
      CorpusOps.sketchFor(bc.value)
        .estimateCount(g.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >= minCount
    }
    grams.filter(isCandidate(col("gram")))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(desc("cnt"), col("gram"))
  }

  val q_heavy_hitters = Q(
    "q_heavy_hitters",
    (s, dir) =>
      frequentGrams(Tables.spread(Tables(s, dir, "documents")),
        "text", n = 3, minCount = 5L),
    Some(s"""
      |WITH g AS (SELECT unnest(${Sql.shingles3("t")}) AS gram
      |           FROM (SELECT ${Sql.toks()} AS t FROM documents))
      |SELECT gram, count(*) AS cnt
      |FROM g
      |GROUP BY gram
      |HAVING count(*) >= 5
      |ORDER BY cnt DESC, gram
      |""".stripMargin))

  /** Per-JVM memo of deserialized sketches keyed by the blob REFERENCE
    * (array keys hash/compare by identity, so distinct blobs can never
    * collide the way an identityHashCode key could — a collision there
    * would probe the wrong sketch, which CAN undercount and silently
    * break the candidate-superset guarantee). The candidate UDF runs
    * once per occurrence; re-parsing the blob per row would dominate.
    * Bounded: a handful of live sketches per JVM at most — clearing on
    * overflow only costs a cheap re-parse. */
  @transient private lazy val sketchCache =
    new java.util.concurrent.ConcurrentHashMap[Array[Byte], CountMinSketch]()
  private[queries] def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (sketchCache.size > 8) sketchCache.clear()
    sketchCache.computeIfAbsent(bytes, b => CountMinSketch.readFrom(b))
  }

  /** Snapshot delta — classify every document as added / removed /
    * changed between the previous crawl and the current one, by content
    * fingerprint. The previous snapshot is derived deterministically
    * from the same table so the oracle can state it in SQL: docs with
    * id ≡ 1 (mod 7) were absent then ("added" now), docs with id ≡ 2
    * (mod 7) carried a stale text ("changed"), and a negated id range
    * (-id - 1 for id ≡ 0 mod 13 — disjoint from real ids at any corpus
    * size) existed then but not now ("removed"). Scale: both sides reduce to (doc_id, md5) pairs at
    * the scan — the join shuffles 24-byte rows co-partitioned on
    * doc_id, never document payloads, and the output is only the delta
    * rows (the steady-state crawl delta is a small fraction of the
    * corpus). Hash domain → oracle-exact. */
  /** The engine form behind [[q_corpus_delta]] and the `snapshot_delta`
    * workflow operator: (idCol, status) for every document that is
    * added, removed, or changed between `prev` and `cur`, by md5 content
    * fingerprint of `textCol`. Unchanged rows are omitted — the delta is
    * the actionable output and at a steady-state crawl a small fraction
    * of the corpus. */
  def snapshotDelta(cur: org.apache.spark.sql.DataFrame,
      prev: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    // the fingerprint doubles as the row-presence marker after the
    // full-outer join, so it must be non-null whenever the ROW exists —
    // a raw md5(null-text) would make a live document read as absent
    // ('removed'/'added' instead of 'changed'/'unchanged')
    def fp(c: org.apache.spark.sql.Column) = coalesce(md5(c), lit("<null>"))
    val c = cur.select(col(idCol), fp(col(textCol)).as("hc"))
    val p = prev.select(col(idCol), fp(col(textCol)).as("hp"))
    c.join(p, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("hp").isNull, "added")
          .when(col("hc").isNull, "removed")
          .when(col("hc") =!= col("hp"), "changed")
          .otherwise("unchanged").as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col(idCol))
  }

  val q_corpus_delta = Q(
    "q_corpus_delta",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      // "removed" rows get NEGATIVE ids (-id - 1): provably disjoint
      // from every real doc_id at any corpus size, where an additive
      // shift collides with the id strides of scaled corpora
      // (graft.Scale's 10x copies live at +k*10_000_000)
      val prev = docs.filter(col("doc_id") % 7 =!= 1)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 2,
            concat(col("text"), lit(" (stale)")))
            .otherwise(col("text")).as("text"))
        .union(docs.filter(col("doc_id") % 13 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"), col("text")))
      snapshotDelta(docs, prev, "doc_id", "text")
    },
    Some("""
      |WITH cur AS (
      |  SELECT doc_id, coalesce(md5(text), '<null>') AS hc FROM documents),
      |prev AS (
      |  SELECT doc_id,
      |         coalesce(md5(CASE WHEN doc_id % 7 = 2 THEN text || ' (stale)'
      |                  ELSE text END), '<null>') AS hp
      |  FROM documents WHERE doc_id % 7 <> 1
      |  UNION ALL
      |  SELECT -doc_id - 1, coalesce(md5(text), '<null>') FROM documents
      |  WHERE doc_id % 13 = 0)
      |SELECT doc_id, status FROM (
      |  SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id,
      |         CASE WHEN hp IS NULL THEN 'added'
      |              WHEN hc IS NULL THEN 'removed'
      |              WHEN hc <> hp THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id)
      |WHERE status <> 'unchanged'
      |ORDER BY doc_id
      |""".stripMargin))

  private val bucketedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Write the two snapshot fingerprints as doc_id-bucketed catalog
    * tables (same bucket count both sides) — memoized per app+dataset so
    * bench/verify loops pay the write once. The 24-byte (doc_id, md5)
    * rows are exactly what [[snapshotDelta]]'s scaladoc says should live
    * at rest; the table name carries a dataset tag so sf dirs never
    * collide in one session. */
  private def bucketedSnapshots(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) =
    graft.core.Caches.memoized(s, dir, bucketedMemo) {
      // 60-bit md5 dir tag + orphaned-location cleanup (round-12 ADVICE:
      // the previous 32-bit String.hashCode tag could collide between
      // two dataset dirs in one session and silently serve wrong deltas)
      val tag = graft.sink.VectorTable.dirTag(dir)
      val curT = s"graft_delta_cur_$tag"
      val prevT = s"graft_delta_prev_$tag"
      Seq(curT, prevT)
        .foreach(graft.sink.VectorTable.dropWithLocation(s, _))
      def fp(c: org.apache.spark.sql.Column) =
        coalesce(md5(c), lit("<null>"))
      val docs = Tables(s, dir, "documents")
      val cur = docs.select(col("doc_id"), fp(col("text")).as("h"))
      val prev = docs.filter(col("doc_id") % 7 =!= 1)
        .select(col("doc_id"),
          fp(when(col("doc_id") % 7 === 2,
              concat(col("text"), lit(" (stale)")))
            .otherwise(col("text"))).as("h"))
        .union(docs.filter(col("doc_id") % 13 === 0)
          .select((-col("doc_id") - 1L).as("doc_id"), fp(col("text")).as("h")))
      graft.sink.VectorTable.writeBucketed(cur, curT, "doc_id", buckets = 8)
      graft.sink.VectorTable.writeBucketed(prev, prevT, "doc_id", buckets = 8)
      (curT, prevT)
    }

  /** [[q_corpus_delta]] consumed from the BUCKETED at-rest layout —
    * the production read path of `VectorTable.writeBucketed`: both
    * crawls' fingerprint tables are bucketed by doc_id into the same
    * bucket count, so the full-outer delta join reads co-located
    * buckets and the plan carries NO hash-partitioning Exchange (the
    * presentation orderBy's range exchange is the only shuffle left;
    * PlanShapeSpec pins it). At 100 TB this is the difference between
    * a metadata-sized merge read and re-shuffling both crawls. Same
    * oracle as q_corpus_delta — the layout changes the plan, never the
    * answer. */
  val q_corpus_delta_bucketed = Q(
    "q_corpus_delta_bucketed",
    (s, dir) => {
      val (curT, prevT) = bucketedSnapshots(s, dir)
      val c = s.table(curT).select(col("doc_id"), col("h").as("hc"))
      val p = s.table(prevT).select(col("doc_id"), col("h").as("hp"))
      c.join(p, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("hp").isNull, "added")
            .when(col("hc").isNull, "removed")
            .when(col("hc") =!= col("hp"), "changed")
            .otherwise("unchanged").as("status"))
        .filter(col("status") =!= "unchanged")
        .orderBy(col("doc_id"))
    },
    Some("""
      |WITH cur AS (
      |  SELECT doc_id, coalesce(md5(text), '<null>') AS hc FROM documents),
      |prev AS (
      |  SELECT doc_id,
      |         coalesce(md5(CASE WHEN doc_id % 7 = 2 THEN text || ' (stale)'
      |                  ELSE text END), '<null>') AS hp
      |  FROM documents WHERE doc_id % 7 <> 1
      |  UNION ALL
      |  SELECT -doc_id - 1, coalesce(md5(text), '<null>') FROM documents
      |  WHERE doc_id % 13 = 0)
      |SELECT doc_id, status FROM (
      |  SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id,
      |         CASE WHEN hp IS NULL THEN 'added'
      |              WHEN hc IS NULL THEN 'removed'
      |              WHEN hc <> hp THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id)
      |WHERE status <> 'unchanged'
      |ORDER BY doc_id
      |""".stripMargin))

  val all: Seq[Q] =
    Seq(q_heavy_hitters, q_corpus_delta, q_corpus_delta_bucketed)
}
