package graft.queries

import graft.core.Tables
import graft.functions.VectorF._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search surface: exact brute-force top-k (the reference's
  * search semantics — filtered ANN top-k, tasks/sinks/milvus.py:122-127 —
  * with the exact path as oracle), k-NN join, per-group vector math.
  *
  * Scale notes:
  *  - single-query top-k broadcasts the 1-row query side and resolves to
  *    TakeOrderedAndProject — per-partition bounded heap, k·P rows to the
  *    driver (the distributed twin of gann.c:498-574's max-heap);
  *  - the k-NN join ranks with a per-query Window after a blocked join;
  *    at 100 TB the candidate set comes from the IVF/GANN probe
  *    (graft.index) instead of a cross join — same ranking tail;
  *  - norms are computed once per side before pairing (gann.c:832-841).
  */
object VectorSearch {

  val q_vec_norms = Q(
    "q_vec_norms",
    (s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          round(l2Norm(col("embedding")), 6).as("l2_norm"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("comp_sum"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      |SELECT vec_id, label,
      |  round(${Sql.norm("embedding")}, 6) AS l2_norm,
      |  round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 6) AS comp_sum
      |FROM embeddings ORDER BY vec_id
      |""".stripMargin))

  val q_knn_brute = Q(
    "q_knn_brute",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), l2Norm(col("embedding")).as("qn"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosinePre(dot(col("embedding"), col("qv")),
            l2Norm(col("embedding")), col("qn")), 6).as("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv, ${Sql.norm("embedding")} AS qn
      |           FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, label,
      |  round(${Sql.dotd("embedding", "qv")} / (${Sql.norm("embedding")} * qn), 6) AS score
      |FROM embeddings, q WHERE vec_id <> 0
      |ORDER BY score DESC, vec_id LIMIT 10
      |""".stripMargin))

  /** Filtered ANN-style top-k: predicate + distance ranking in one plan
    * (the `filter='modality like ...'` search of the reference,
    * examples/multimodal_rag.md:190-194). */
  val q_knn_filtered = Q(
    "q_knn_filtered",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 1)
        .select(col("embedding").as("qv"), l2Norm(col("embedding")).as("qn"))
      e.filter(col("label") % 2 === 0 && col("vec_id") =!= 1)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(l2Dist(col("embedding"), col("qv")), 6).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
      |SELECT vec_id, label,
      |  round(sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |    i -> (embedding[i]::DOUBLE - qv[i]::DOUBLE) * (embedding[i]::DOUBLE - qv[i]::DOUBLE)))), 6) AS dist
      |FROM embeddings, q
      |WHERE label % 2 = 0 AND vec_id <> 1
      |ORDER BY dist, vec_id LIMIT 10
      |""".stripMargin))

  /** k-NN join: top-3 neighbours (cosine) for each of the first 20 vectors,
    * ranked by a per-query Window. */
  val q_knn_join = Q(
    "q_knn_join",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), l2Norm(col("embedding")).as("nrm"))
      val qs = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(desc("score"), col("vec_id"))
      e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(cosinePre(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6)
            .as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        // BIGINT after the prune: oracle dtype parity (DuckDB row_number
        // is BIGINT) without blocking the WindowGroupLimit pattern
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""
      |WITH n AS (SELECT vec_id, embedding, ${Sql.norm("embedding")} AS nrm FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id,
      |    round(${Sql.dotd("c.embedding", "q.embedding")} / (c.nrm * q.nrm), 6) AS score
      |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 20)
      |SELECT qid, vec_id, score, rnk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk
      |  FROM scored)
      |WHERE rnk <= 3 ORDER BY qid, rnk
      |""".stripMargin))

  /** Mean-pool centroid per label, long format (label, pos, mean_val). */
  val q_meanpool_label = Q(
    "q_meanpool_label",
    (s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("mean_val"))
        .orderBy(col("label"), col("pos"))
    },
    // positions derive from the data (len(embedding)) on both sides, so a
    // dim mismatch surfaces as a real diff instead of silently diverging
    Some("""
      |SELECT label, i AS pos, round(avg(embedding[i + 1]::DOUBLE), 6) AS mean_val
      |FROM (SELECT label, embedding, unnest(range(0, len(embedding))) AS i
      |      FROM embeddings)
      |GROUP BY label, i ORDER BY label, pos
      |""".stripMargin))

  /** Unit-normalized vectors, long format, first 10 ids. */
  val q_vec_normalize = Q(
    "q_vec_normalize",
    (s, dir) => {
      Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), posexplode(normalize(col("embedding"))).as(Seq("pos", "vraw")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          round(col("vraw"), 6).as("v"))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some(s"""
      |SELECT vec_id, i AS pos,
      |  round(embedding[i + 1]::DOUBLE / ${Sql.norm("embedding")}, 6) AS v
      |FROM (SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i
      |      FROM embeddings WHERE vec_id < 10)
      |ORDER BY vec_id, pos
      |""".stripMargin))

  /** Grouped clustering assignment: every vector assigned to its nearest
    * of 8 fixed centroids (vec_id < 8 as deterministic seeds) — the
    * assignment step of the reference's GKMeans
    * (radient/tasks/sinks/local/_gkmeans.py:125-133 hard-assign by
    * euclidean distance), exact and oracle-checkable where the full
    * iterative fit is not. Scale: the centroid side is 8 rows broadcast;
    * one narrow pass over the vectors, argmin via per-row ranking. */
  val q_cluster_assign = Q(
    "q_cluster_assign",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          l2Dist(col("embedding"), col("cv")).as("dist"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("vec_id"), col("cid").as("cluster"),
          round(col("dist"), 6).as("dist"))
        .orderBy(col("vec_id"))
    },
    Some("""
      |SELECT vec_id, cluster, dist FROM (
      |  SELECT e.vec_id, c.vec_id AS cluster,
      |    round(sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |      i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
      |         * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)))), 6) AS dist,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
      |        i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
      |           * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)))), c.vec_id) AS rnk
      |  FROM embeddings e, embeddings c WHERE c.vec_id < 8)
      |WHERE rnk = 1
      |ORDER BY vec_id
      |""".stripMargin))

  /** MMR-diversified rerank (Carbonell & Goldstein '98) via the batch
    * [[graft.sink.Mmr]] operator: greedy top-5 from the top-20 cosine
    * candidates of probe vec_id=0, score = 0.7·rel −
    * 0.3·max-sim-to-selected, ties by vec_id — double arithmetic shaped
    * identically to the DuckDB oracle, so the selection is hash-exact.
    * Scale: rerank runs AFTER retrieval on a per-query candidate list
    * bounded by k (here 20); the whole greedy selection is ONE
    * aggregate row per query group, so a batch of queries is a
    * groupBy(qid) with constant work per group. Candidate generation is
    * the same broadcast top-k plan as q_knn_brute. */
  val q_mmr_rerank = Q(
    "q_mmr_rerank",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val cands = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"),
          cosine(col("embedding"), col("qv")).as("rel"))
        .orderBy(desc("rel"), col("vec_id"))
        .limit(20)
        .withColumn("qid", lit(0L))
      graft.sink.Mmr.diversify(cands, "qid", "vec_id", "rel", "emb", k = 5)
        .select(col("step"), col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("step"))
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      |cand AS (
      |  SELECT vec_id, embedding, ${Sql.cosine("embedding", "qv")} AS rel
      |  FROM embeddings, q WHERE vec_id <> 0
      |  ORDER BY rel DESC, vec_id LIMIT 20),
      |sims AS (
      |  SELECT a.vec_id AS ida, b.vec_id AS idb,
      |    ${Sql.cosine("a.embedding", "b.embedding")} AS sim
      |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
      |p1 AS (SELECT vec_id, 0.7::DOUBLE * rel AS score, 1::BIGINT AS step
      |       FROM cand ORDER BY score DESC, vec_id LIMIT 1),
      |p2 AS (SELECT c.vec_id,
      |         0.7::DOUBLE * c.rel - 0.3::DOUBLE * (
      |           SELECT max(s.sim) FROM sims s WHERE s.ida = c.vec_id
      |           AND s.idb IN (SELECT vec_id FROM p1)) AS score, 2::BIGINT AS step
      |       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1)
      |       ORDER BY score DESC, vec_id LIMIT 1),
      |p3 AS (SELECT c.vec_id,
      |         0.7::DOUBLE * c.rel - 0.3::DOUBLE * (
      |           SELECT max(s.sim) FROM sims s WHERE s.ida = c.vec_id
      |           AND s.idb IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2)) AS score, 3::BIGINT AS step
      |       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2)
      |       ORDER BY score DESC, vec_id LIMIT 1),
      |p4 AS (SELECT c.vec_id,
      |         0.7::DOUBLE * c.rel - 0.3::DOUBLE * (
      |           SELECT max(s.sim) FROM sims s WHERE s.ida = c.vec_id
      |           AND s.idb IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2 UNION SELECT vec_id FROM p3)) AS score, 4::BIGINT AS step
      |       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2 UNION SELECT vec_id FROM p3)
      |       ORDER BY score DESC, vec_id LIMIT 1),
      |p5 AS (SELECT c.vec_id,
      |         0.7::DOUBLE * c.rel - 0.3::DOUBLE * (
      |           SELECT max(s.sim) FROM sims s WHERE s.ida = c.vec_id
      |           AND s.idb IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2 UNION SELECT vec_id FROM p3 UNION SELECT vec_id FROM p4)) AS score, 5::BIGINT AS step
      |       FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM p1 UNION SELECT vec_id FROM p2 UNION SELECT vec_id FROM p3 UNION SELECT vec_id FROM p4)
      |       ORDER BY score DESC, vec_id LIMIT 1)
      |SELECT step, vec_id, round(score, 6) AS score FROM (
      |  SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
      |  UNION ALL SELECT * FROM p4 UNION ALL SELECT * FROM p5)
      |ORDER BY step
      |""".stripMargin))

  /** Per-item vector-SEQUENCE column (8 member vectors in vec_id order,
    * as ArrayType(ArrayType(float))) — the multi-vector shape the
    * reference emits for time-varying audio features
    * (radient/tasks/vectorizers/audio/torchaudio.py:43-46) and FastRP
    * node sequences (graph/fastrp.py:52-53), mapped per SURVEY §1.5 to a
    * nested array column. Shared by the two q_multivec entries. */
  private def itemSequences(e: org.apache.spark.sql.DataFrame) =
    e.groupBy(floor(col("vec_id") / 8).cast("long").as("item_id"))
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("sv"))
      .select(col("item_id"),
        transform(col("sv"), x => x.getField("embedding")).as("vecs"))

  /** Multi-vector mean-pool: materialize the nested sequence column,
    * then pool it elementwise back to one vector per item — torchaudio's
    * reduce=mean path (torchaudio.py:46) over the stored sequence.
    * Long-format, exact member set → hash-checked (the oracle averages
    * the same members directly; the nested column is the Spark-side
    * representation under test). Scale: one groupBy shuffle builds the
    * sequences (in a real pipeline the column arrives pre-materialized
    * from the vectorizer), then a narrow explode + partial agg. */
  val q_multivec_meanpool = Q(
    "q_multivec_meanpool",
    (s, dir) => {
      itemSequences(Tables(s, dir, "embeddings"))
        .select(col("item_id"), explode(col("vecs")).as("v"))
        .select(col("item_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("item_id"), col("pos").cast("long").as("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("mean_val"))
        .orderBy(col("item_id"), col("pos"))
    },
    Some("""
      |SELECT CAST(vec_id // 8 AS BIGINT) AS item_id, i AS pos,
      |  round(avg(embedding[i + 1]::DOUBLE), 6) AS mean_val
      |FROM (SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS i
      |      FROM embeddings)
      |GROUP BY item_id, i ORDER BY item_id, pos
      |""".stripMargin))

  /** Multi-vector search: an item's score is the MIN exact L2 distance
    * over its vector sequence (the simplest late-interaction semantics —
    * the "multi-vector support" line of the reference's roadmap,
    * README.md:118, over the torchaudio.py:43-46 sequence shape).
    * The min folds INSIDE the nested column via array_min∘transform —
    * no explode, no per-member shuffle; at scale this is a scan with a
    * broadcast 1-row query side and a TakeOrderedAndProject tail.
    * Exact distances, deterministic fold order on both sides →
    * hash-checked. */
  val q_multivec_search = Q(
    "q_multivec_search",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      itemSequences(e)
        .filter(col("item_id") =!= 0) // item 0 contains the query vector
        .crossJoin(broadcast(q))
        .select(col("item_id"),
          round(array_min(transform(col("vecs"), v => l2Dist(v, col("qv")))), 6)
            .as("dist"))
        .orderBy(col("dist"), col("item_id"))
        .limit(10)
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      |SELECT CAST(vec_id // 8 AS BIGINT) AS item_id,
      |  round(min(${Sql.l2("embedding", "qv")}), 6) AS dist
      |FROM embeddings, q
      |WHERE vec_id // 8 <> 0
      |GROUP BY item_id
      |ORDER BY dist, item_id LIMIT 10
      |""".stripMargin))

  val all: Seq[Q] = Seq(
    q_vec_norms, q_knn_brute, q_knn_filtered, q_knn_join,
    q_meanpool_label, q_vec_normalize, q_cluster_assign, q_mmr_rerank,
    q_multivec_meanpool, q_multivec_search)
}
