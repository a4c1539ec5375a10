package graft.queries

import graft.core.Tables
import graft.functions.{TextF, VectorF}
import graft.functions.VectorF._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rest of the vector-search verb surface a reference user reaches
  * through the Milvus sink's kwargs passthrough
  * (radient/tasks/sinks/milvus.py:122-127 hands `**kwargs` straight to
  * `client.search`, over collections whose binary/dense/sparse fields the
  * interface discovers at milvus.py:69-77): range search (radius +
  * range_filter bounds instead of top-k), grouping search (top groups by
  * best hit, a bounded number of hits per group), and hybrid multi-field
  * search fused with reciprocal-rank fusion. All three are exact,
  * SQL-expressible plans — hash-checked against DuckDB — because the
  * fusion/ranking tails are rank arithmetic, not approximation.
  *
  * Scale notes:
  *  - range search is a scan + broadcast 1-row query: the score filter
  *    prunes BEFORE any shuffle, so the output (not the corpus) sizes the
  *    presentation sort; at 100 TB an index shortlist (graft.index) feeds
  *    the same verify-filter tail.
  *  - grouping search ranks per-label inside one hash-partitioned window
  *    (InferWindowGroupLimit caps each group's sort at group_size), then
  *    ranks the 5 surviving group-best rows — the per-group state never
  *    exceeds group_size, unlike a global sort.
  *  - hybrid RRF joins two 20-row rank lists — driver-scale after two
  *    independently-bounded top-k plans, each of which pushes its own
  *    partial top-k (TakeOrderedAndProject) to the data.
  */
object HybridSearch {

  /** Fit-once dense corpus state for the hybrid query (the feature-hash
    * twin of `Postings`' inverted index): dv = (doc_id, pos, v) signed
    * bucket counts, dn = (doc_id, n2) squared norms. Memoized per
    * (application, dataset) like every other materialized index — repeat
    * hybrid searches are steady-state lookups, not refits. */
  private final case class H(dv: org.apache.spark.sql.DataFrame,
      dn: org.apache.spark.sql.DataFrame)

  private val hashMemo =
    new java.util.concurrent.ConcurrentHashMap[String, H]()

  private def hashPostings(s: org.apache.spark.sql.SparkSession,
      dir: String, dim: Int): H =
    graft.core.Caches.memoized(s, s"$dir#hashdim$dim", hashMemo) {
      val dv = graft.core.Caches.cached(
        Tables.spread(Tables(s, dir, "documents"))
          .select(col("doc_id"), explode(TextF.tokens(col("text"))).as("tok"))
          .select(col("doc_id"),
            TextF.featureBucket(col("tok"), dim).as("pos"),
            TextF.featureSign(col("tok")).as("sgn"))
          .groupBy(col("doc_id"), col("pos")).agg(sum(col("sgn")).as("v")))
      val dn = graft.core.Caches.cached(
        dv.groupBy(col("doc_id")).agg(sum(col("v") * col("v")).as("n2")))
      H(dv, dn)
    }

  /** Range search (Milvus `radius`/`range_filter` kwargs): every vector
    * whose cosine to the query lands in [0.15, 0.45) — a band, not a
    * top-k. Scores are rounded to 6dp BEFORE the band filter so both
    * engines make the identical keep/drop decision at the boundaries. */
  val q_knn_range = Q(
    "q_knn_range",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 2)
        .select(col("embedding").as("qv"), l2Norm(col("embedding")).as("qn"))
      e.filter(col("vec_id") =!= 2)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosinePre(VectorF.dot(col("embedding"), col("qv")),
            l2Norm(col("embedding")), col("qn")), 6).as("score"))
        .filter(col("score") >= 0.15 && col("score") < 0.45)
        .orderBy(desc("score"), col("vec_id"))
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv, ${Sql.norm("embedding")} AS qn
      |           FROM embeddings WHERE vec_id = 2)
      |SELECT vec_id, label, score FROM (
      |  SELECT vec_id, label,
      |    round(${Sql.dotd("embedding", "qv")} / (${Sql.norm("embedding")} * qn), 6) AS score
      |  FROM embeddings, q WHERE vec_id <> 2)
      |WHERE score >= 0.15 AND score < 0.45
      |ORDER BY score DESC, vec_id
      |""".stripMargin))

  /** Grouping search (Milvus `group_by_field`/`group_size` kwargs): the
    * top-5 labels by their best hit's cosine, each contributing its best
    * 2 hits. Group rank and in-group rank are both explicit, so the
    * output is self-describing and order-free for the hash compare. */
  val q_knn_grouped = Q(
    "q_knn_grouped",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 3)
        .select(col("embedding").as("qv"), l2Norm(col("embedding")).as("qn"))
      val scored = e.filter(col("vec_id") =!= 3)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosinePre(VectorF.dot(col("embedding"), col("qv")),
            l2Norm(col("embedding")), col("qn")), 6).as("score"))
      val perLabel = Window.partitionBy(col("label"))
        .orderBy(desc("score"), col("vec_id"))
      // rn <= 2 right after the window → InferWindowGroupLimit bounds each
      // label's sort state at group_size
      val hits = scored
        .withColumn("rn", row_number().over(perLabel).cast("long"))
        .filter(col("rn") <= 2)
      // 5 best groups by their rank-1 hit; the rank over ≤5 survivors of
      // an orderBy+limit equals the global group rank (same total order)
      val gtop = hits.filter(col("rn") === 1)
        .select(col("label"), col("score").as("best"))
        .orderBy(desc("best"), col("label")).limit(5)
        .withColumn("grank",
          row_number().over(Window.orderBy(desc("best"), col("label"))).cast("long"))
        .select(col("label"), col("grank"))
      hits.join(broadcast(gtop), Seq("label"))
        .select(col("grank"), col("label"), col("rn"), col("vec_id"), col("score"))
        .orderBy(col("grank"), col("rn"))
    },
    Some(s"""
      |WITH q AS (SELECT embedding AS qv, ${Sql.norm("embedding")} AS qn
      |           FROM embeddings WHERE vec_id = 3),
      |scored AS (
      |  SELECT vec_id, label,
      |    round(${Sql.dotd("embedding", "qv")} / (${Sql.norm("embedding")} * qn), 6) AS score
      |  FROM embeddings, q WHERE vec_id <> 3),
      |hits AS (SELECT * FROM (
      |    SELECT vec_id, label, score,
      |      CAST(row_number() OVER (PARTITION BY label
      |                              ORDER BY score DESC, vec_id) AS BIGINT) AS rn
      |    FROM scored) WHERE rn <= 2),
      |gtop AS (SELECT label, CAST(row_number() OVER
      |             (ORDER BY score DESC, label) AS BIGINT) AS grank
      |         FROM hits WHERE rn = 1
      |         ORDER BY grank LIMIT 5)
      |SELECT grank, label, rn, vec_id, score
      |FROM hits JOIN gtop USING (label)
      |ORDER BY grank, rn
      |""".stripMargin))

  /** Hybrid search: the sparse tf-idf ranking of `q_sparse_search` and a
    * dense signed-feature-hash ranking (the integer-exact `HashEmbed`
    * kernel of `q_embed_hash`, dim=16) over the SAME query string and the
    * SAME `documents` corpus, fused by reciprocal-rank fusion
    * rrf = Σ 1/(60 + rank) over the two top-20 lists (the standard
    * fusion Milvus ships as RRFRanker; k=60 per Cormack/Clarke/Buettcher,
    * SIGIR'09). Exactness: both ranks are integers from deterministic
    * total orders (rounded scores, id tiebreaks), so the fused score is a
    * fixed-order sum of two rationals — bit-identical across engines with
    * no float-accumulation caveats. */
  val q_hybrid_rrf = Q(
    "q_hybrid_rrf",
    (s, dir) => {
      import s.implicits._
      val dim = 16
      // ---- sparse leg: exact tf·(N/df) cosine, top-20 (q_sparse_search
      // shape; fit-once postings memoized in Postings)
      val p = Postings(s, dir)
      val qw = SparseSearch.queryTf.toDF("tok", "qtf")
        .join(p.dfreq, Seq("tok")).crossJoin(broadcast(p.n))
        .withColumn("qw", (col("qtf") * col("n")).cast("double") / col("df"))
        .select(col("tok"), col("qw"))
      val qnorm = qw
        .agg(sort_array(collect_list(struct(col("tok"), col("qw")))).as("ws"))
        .select(sqrt(aggregate(col("ws"), lit(0.0),
          (a, x) => a + x.getField("qw") * x.getField("qw"))).as("qnorm"))
      val sdots = p.w.join(broadcast(qw), Seq("tok"))
        .select(col("doc_id"), col("tok"), (col("w") * col("qw")).as("term"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("tok"), col("term")))).as("ts"))
        .select(col("doc_id"),
          aggregate(col("ts"), lit(0.0), (a, x) => a + x.getField("term")).as("dot"))
      val sOrder = Seq(desc("sscore"), col("doc_id").asc)
      val sparse = sdots.join(p.dnorm, Seq("doc_id")).crossJoin(broadcast(qnorm))
        .withColumn("sscore", round(col("dot") / (col("dnorm") * col("qnorm")), 6))
        .orderBy(sOrder: _*).limit(20)
        .withColumn("srnk", row_number().over(Window.orderBy(sOrder: _*)).cast("long"))
        .select(col("doc_id"), col("srnk"))
      // ---- dense leg: signed feature hash (integer dot/norms → the only
      // float ops are two sqrts and one division, identical both engines);
      // dv/dn are fit-once corpus state (hashPostings memo)
      val hp = hashPostings(s, dir, dim)
      val dv = hp.dv
      val qv = SparseSearch.QUERY.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).toSeq.toDF("tok")
        .select(TextF.featureBucket(col("tok"), dim).as("pos"),
          TextF.featureSign(col("tok")).as("sgn"))
        .groupBy(col("pos")).agg(sum(col("sgn")).as("qv"))
      val qn2 = qv.agg(sum(col("qv") * col("qv")).as("qn2"))
      val dn = hp.dn
      val ddot = dv.join(broadcast(qv), Seq("pos"))
        .groupBy(col("doc_id")).agg(sum(col("v") * col("qv")).as("dot"))
      val dOrder = Seq(desc("dscore"), col("doc_id").asc)
      val dense = dn.filter(col("n2") > 0)
        .join(ddot, Seq("doc_id"), "left").crossJoin(broadcast(qn2))
        .withColumn("dscore",
          round(coalesce(col("dot"), lit(0L)).cast("double") /
            (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))), 6))
        .orderBy(dOrder: _*).limit(20)
        .withColumn("drnk", row_number().over(Window.orderBy(dOrder: _*)).cast("long"))
        .select(col("doc_id"), col("drnk"))
      // ---- RRF fusion of the two rank lists (k=60)
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("srnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("drnk")), lit(0.0)), 6))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(10)
        // rank 0 = absent from that modality's top-20: keeps both output
        // columns non-null so the cross-engine dtype stays integral
        .select(col("doc_id"),
          coalesce(col("srnk"), lit(0L)).as("srnk"),
          coalesce(col("drnk"), lit(0L)).as("drnk"),
          col("rrf"))
    },
    Some {
      val qVals = SparseSearch.queryTf.map { case (t, c) => s"('$t', $c)" }.mkString(", ")
      val qToks = SparseSearch.QUERY.trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => s"('$t')").mkString(", ")
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
      |sdots AS (SELECT doc_id, list_sum(list(w * qw ORDER BY tok)) AS dot
      |          FROM w JOIN qw USING (tok) GROUP BY doc_id),
      |sparse AS (SELECT doc_id, CAST(row_number() OVER
      |               (ORDER BY round(dot / (dnorm * qnorm), 6) DESC, doc_id)
      |             AS BIGINT) AS srnk
      |           FROM sdots JOIN dnorm USING (doc_id) CROSS JOIN qn
      |           ORDER BY srnk LIMIT 20),
      |dv AS (SELECT doc_id, ${Sql.h32("tok")} % 16 AS pos,
      |         CAST(sum(2 * (${Sql.h32("'s#' || tok")} % 2) - 1) AS BIGINT) AS v
      |       FROM t GROUP BY doc_id, pos),
      |qtoks(tok) AS (VALUES $qToks),
      |qv AS (SELECT ${Sql.h32("tok")} % 16 AS pos,
      |         CAST(sum(2 * (${Sql.h32("'s#' || tok")} % 2) - 1) AS BIGINT) AS qv
      |       FROM qtoks GROUP BY pos),
      |qn2 AS (SELECT sum(qv * qv) AS qn2 FROM qv),
      |dn AS (SELECT doc_id, sum(v * v) AS n2 FROM dv GROUP BY doc_id),
      |ddot AS (SELECT doc_id, sum(v * qv) AS dot
      |         FROM dv JOIN qv USING (pos) GROUP BY doc_id),
      |dense AS (SELECT doc_id, CAST(row_number() OVER
      |              (ORDER BY round(CAST(coalesce(dot, 0) AS DOUBLE) /
      |                 (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE))), 6)
      |               DESC, doc_id) AS BIGINT) AS drnk
      |          FROM dn LEFT JOIN ddot USING (doc_id) CROSS JOIN qn2
      |          WHERE n2 > 0
      |          ORDER BY drnk LIMIT 20)
      |SELECT doc_id, coalesce(srnk, 0) AS srnk, coalesce(drnk, 0) AS drnk,
      |  round(coalesce(CAST(1 AS DOUBLE) / (60 + srnk), 0) +
      |        coalesce(CAST(1 AS DOUBLE) / (60 + drnk), 0), 6) AS rrf
      |FROM sparse FULL OUTER JOIN dense USING (doc_id)
      |ORDER BY rrf DESC, doc_id LIMIT 10
      |""".stripMargin
    })

  val all: Seq[Q] = Seq(q_knn_range, q_knn_grouped, q_hybrid_rrf)
}
