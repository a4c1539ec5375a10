package graft.queries

import graft.core.Tables
import graft.vectorize.{FastRP, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Graph/multimodal pipeline query entries — ALL oracle-checked since
  * round 11: q_pagerank replays its integer-picos recursion as a
  * fixed-depth recursive CTE (round 10), q_fastrp_embed its
  * integer-micros iteration as chained CTEs (round 10), and
  * q_multimodal_embed emulates the stub decoders' byte math (including
  * exact float32 fold emulation) in DuckDB with an integer-micros
  * output (round 11). FastRPSpec / MultimodalSpec keep the in-process
  * closed-form checks.
  */
object Pipelines {

  /** The customer↔nation bipartite graph both graph entries run on
    * (nation nodes offset by 10 000 to share the long id space),
    * symmetrized for undirected propagation — one builder so the "same
    * graph" entries can never silently diverge. */
  private def custNationEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey").as("src"),
        (col("c_nationkey").cast("long") + 10000L).as("dst"),
        lit(1.0).as("weight"))
    cust.union(
      cust.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
  }

  /** FastRP node embeddings over the customer↔nation bipartite graph
    * derived from the `customer` table (nation nodes offset by 10_000 to
    * share the long id space), symmetrized as the reference does for
    * undirected input (radient/tasks/vectorizers/graph/fastrp.py:32-53).
    * HASH-CHECKED since round 10: [[graft.vectorize.FastRP]] carries its
    * vector state in integer micros (init row, per-edge contributions
    * and weighted terms all rounded to whole micros; sums therefore
    * exact on any partitioning), so the DuckDB oracle replays the same
    * four propagation stages as chained CTEs over the exploded
    * (node, pos, value) form — every float expression below mirrors the
    * Spark side op-for-op, including the md5-derived sparse projection
    * row (`TextF.h32` ≡ the '0x'+substr(md5) BIGINT parse). FastRPSpec
    * additionally pins the distributed path against a dense local
    * implementation with the IDENTICAL quantization — exact equality,
    * no tolerance. */
  val q_fastrp_embed = Q(
    "q_fastrp_embed",
    (s, dir) => {
      FastRP.embed(custNationEdges(s, dir), dim = 8)
        .select(col("node"), posexplode(col("vec")).as(Seq("pos", "vraw")))
        .select(col("node"), col("pos"), round(col("vraw"), 6).as("v"))
        .orderBy(col("node"), col("pos"))
    },
    Some("""
      |WITH edges AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS src,
      |         CAST(c_nationkey AS BIGINT) + 10000 AS dst, 1.0 AS weight
      |  FROM customer
      |  UNION ALL
      |  SELECT CAST(c_nationkey AS BIGINT) + 10000, CAST(c_custkey AS BIGINT), 1.0
      |  FROM customer),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src),
      |dims AS (SELECT unnest(range(0, 8)) AS pos),
      |n0 AS (
      |  SELECT node, pos,
      |    round((CASE WHEN u < d / 2 THEN s WHEN u < d THEN -s ELSE 0.0 END)
      |      * (0.5 * pow(coalesce(outw, 0.0), 0.0) / n) * 1000000.0, 0) AS v
      |  FROM (
      |    SELECT nodes.node, dims.pos, outw.outw, nn.n,
      |      (CAST(('0x' || substr(md5('rp42#' || CAST(nodes.node AS VARCHAR)
      |        || '#' || CAST(dims.pos AS VARCHAR)), 1, 8)) AS BIGINT)
      |        % 1000000) / 1000000.0 AS u,
      |      1.0 / sqrt(8.0) AS d,
      |      sqrt(1.0 / (1.0 / sqrt(8.0))) / sqrt(8.0) AS s
      |    FROM nodes CROSS JOIN dims CROSS JOIN nn
      |    LEFT JOIN outw ON outw.src = nodes.node)),
      |n1 AS (SELECT e.src AS node, x.pos, sum(round(x.v * e.weight, 0)) AS v
      |       FROM edges e JOIN n0 x ON e.dst = x.node GROUP BY e.src, x.pos),
      |n2 AS (SELECT e.src AS node, x.pos, sum(round(x.v * e.weight, 0)) AS v
      |       FROM edges e JOIN n1 x ON e.dst = x.node GROUP BY e.src, x.pos),
      |n3 AS (SELECT e.src AS node, x.pos, sum(round(x.v * e.weight, 0)) AS v
      |       FROM edges e JOIN n2 x ON e.dst = x.node GROUP BY e.src, x.pos),
      |n4 AS (SELECT e.src AS node, x.pos, sum(round(x.v * e.weight, 0)) AS v
      |       FROM edges e JOIN n3 x ON e.dst = x.node GROUP BY e.src, x.pos),
      |terms AS (
      |  SELECT node, pos, round(v * 0.1, 0) AS t FROM n1
      |  UNION ALL SELECT node, pos, round(v * 0.2, 0) FROM n2
      |  UNION ALL SELECT node, pos, round(v * 1.0, 0) FROM n3
      |  UNION ALL SELECT node, pos, round(v * 3.0, 0) FROM n4),
      |o AS (SELECT node, pos, sum(t) AS mu FROM terms GROUP BY node, pos)
      |SELECT node, CAST(pos AS INT) AS pos,
      |  round(mu / 1000000.0, 6) AS v
      |FROM o ORDER BY node, pos
      |""".stripMargin))

  /** Multimodal featurization: documents' text bytes treated as opaque
    * binary payloads, routed image/audio/video/text by id and featurized
    * through the per-partition stub decoders (Multimodal.featurize —
    * real Spark plumbing, stub decode; SURVEY.md §7.0).
    *
    * HASH-CHECKED (round 11): every stub decoder is deterministic byte
    * math over the UTF-8 payload (the corpus is ASCII, so DuckDB's
    * `ascii(substr(...))` reads the exact byte), and the float32
    * accumulation the audio stub performs is emulated exactly in SQL by
    * re-rounding each fold step through REAL — double precision (53
    * bits) ≥ 2·24+2, so round-to-double-then-to-float equals direct
    * float rounding for +/·(Figueroa's double-rounding theorem), making
    * `CAST(a + v AS REAL)` a bit-exact float add. The unit-normalize is
    * the same sequential double fold as VectorF.dot on both sides. The
    * residual cross-engine gap is only the two engines' round(x, 6)
    * picking different nearest-doubles of the SAME 6-dp decimal, so the
    * output is lifted to exact integer micros
    * (the [[graft.queries.TextAnalysis]] integer-micros discipline) —
    * bit-equal BIGINT on both engines. MultimodalSpec still pins the
    * per-modality feature math in-process. */
  val q_multimodal_embed = Q(
    "q_multimodal_embed",
    (s, dir) => {
      // ONE spread scan shared by featurize's modality branches
      // (round 18): the per-modality union used to re-scan + re-shuffle
      // the single-row-group file once PER BRANCH (two 1-task scan
      // stages in the profile, 1.4 s each at sf0.1); pre-materializing
      // the pruned (doc_id, text) base makes both branches read the
      // 32-way cache. Entry-result-class cache — released between bench
      // passes, rebuilt inside every timed execution.
      val base = graft.core.Caches.cachedTransient(
        Tables.spread(Tables(s, dir, "documents")
          .select(col("doc_id"), col("text"))))
      base.count()
      val docs = base
        .select(col("doc_id").as("id"),
          element_at(array(lit("text"), lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 4 + 1).cast("int")).as("modality"),
          col("text").cast(BinaryType).as("data"),
          lit(null).cast(StringType).as("path"))
      Multimodal.featurize(docs, dim = 16)
        .select(col("id"), col("modality"),
          posexplode(col("embedding")).as(Seq("pos", "vraw")))
        .select(col("id"), col("modality"), col("pos"),
          expr("CAST(round(round(vraw, 6) * 1000000, 0) AS BIGINT)").as("v_mu"))
        .orderBy(col("id"), col("pos"))
    },
    Some(s"""
      |WITH pos16 AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS pos),
      |d AS (
      |  SELECT doc_id AS id,
      |    (['text','image','audio','video'])[CAST(doc_id % 4 + 1 AS INT)]
      |      AS modality,
      |    text, CAST(length(text) AS BIGINT) AS len
      |  FROM documents),
      |b AS (
      |  SELECT id, CAST(t.i AS BIGINT) AS i,
      |    ascii(substr(text, CAST(t.i + 1 AS INT), 1)) AS code
      |  FROM d, unnest(range(0, len)) AS t(i)
      |  WHERE modality <> 'text'),
      |img AS (
      |  SELECT d.id, p.pos, CAST(coalesce(c.cnt, 0) AS DOUBLE) AS x
      |  FROM d CROSS JOIN pos16 p
      |  LEFT JOIN (SELECT id, code % 16 AS pos, count(*) AS cnt
      |             FROM b GROUP BY 1, 2) c ON c.id = d.id AND c.pos = p.pos
      |  WHERE d.modality = 'image'),
      |aud AS (
      |  SELECT d.id, p.pos, coalesce(a.s, CAST(0.0 AS DOUBLE)) AS x
      |  FROM d CROSS JOIN pos16 p
      |  LEFT JOIN (
      |    SELECT id, CAST(i % 16 AS INT) AS pos,
      |      CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list(CAST(CAST(code / 128.0 AS REAL) * CAST(code / 128.0 AS REAL)
      |               AS DOUBLE) ORDER BY i)),
      |        (acc, v) -> CAST(CAST(acc + v AS REAL) AS DOUBLE)) AS DOUBLE) AS s
      |    FROM b GROUP BY 1, 2) a ON a.id = d.id AND a.pos = p.pos
      |  WHERE d.modality = 'audio'),
      |vid AS (
      |  SELECT d.id, p.pos, CAST(coalesce(c.cnt, 0) AS DOUBLE) AS x
      |  FROM d CROSS JOIN pos16 p
      |  LEFT JOIN (
      |    SELECT b.id, b.code % 16 AS pos, count(*) AS cnt
      |    FROM b JOIN d d2 ON d2.id = b.id
      |    WHERE b.i % greatest(1, d2.len // 16) = 0
      |    GROUP BY 1, 2) c ON c.id = d.id AND c.pos = p.pos
      |  WHERE d.modality = 'video'),
      |tok AS (
      |  SELECT id, unnest(${Sql.toks()}) AS tok FROM d WHERE modality = 'text'),
      |txt AS (
      |  SELECT d.id, p.pos, CAST(coalesce(s.v, 0) AS DOUBLE) AS x
      |  FROM d CROSS JOIN pos16 p
      |  LEFT JOIN (
      |    SELECT id, CAST(${Sql.h32("tok")} % 16 AS INT) AS pos,
      |      sum(2 * (${Sql.h32("'s#' || tok")} % 2) - 1) AS v
      |    FROM tok GROUP BY 1, 2) s ON s.id = d.id AND s.pos = p.pos
      |  WHERE d.modality = 'text'),
      |feats AS (
      |  SELECT * FROM img UNION ALL SELECT * FROM aud
      |  UNION ALL SELECT * FROM vid UNION ALL SELECT * FROM txt),
      |nrm AS (
      |  SELECT id, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list(x ORDER BY pos)), (acc, v) -> acc + v * v)) AS n
      |  FROM feats GROUP BY id)
      |SELECT f.id, d.modality, f.pos,
      |  CAST(round(round(CAST(CAST(
      |      CASE WHEN nrm.n = 0.0 THEN 0.0 ELSE f.x / nrm.n END
      |    AS REAL) AS DOUBLE), 6) * 1000000, 0) AS BIGINT) AS v_mu
      |FROM feats f JOIN nrm USING (id) JOIN d USING (id)
      |ORDER BY f.id, f.pos
      |""".stripMargin))

  /** PageRank centrality over the same customer↔nation bipartite graph
    * as [[q_fastrp_embed]] — the "importance" signal a curation pass
    * weights sources by (domain authority at web scale). HASH-CHECKED:
    * [[graft.graph.PageRank]] runs in integer picos (per-edge
    * contributions rounded to BIGINT each round — the lm_cross_entropy
    * integer-micros discipline applied per iteration), so the DuckDB
    * oracle replays the identical recursion as a fixed-depth recursive
    * CTE. Oracle-side mechanics: `nodes` dedups via an explicit
    * DISTINCT-over-UNION-ALL (a plain UNION inside a WITH RECURSIVE list
    * is mis-bound), and zero-weight SELF-LOOP edges keep every node in
    * the working table so the recursive member references `pr` exactly
    * once — they contribute round(r·0.0) = 0, changing nothing. The
    * graph is symmetrized → sink-free, so the dangling term is
    * structurally absent on both sides. PageRankSpec still pins the math
    * against a dense driver-side power iteration, the mass invariant,
    * and bounded checkpoint storage. Output rounded to 9 dp, hub
    * (nation) nodes first. */
  val q_pagerank = Q(
    "q_pagerank",
    (s, dir) => {
      graft.graph.PageRank.ranks(custNationEdges(s, dir), iters = 8)
        .select(col("node"), round(col("rank"), 9).as("rank"))
        .orderBy(desc("rank"), col("node"))
    },
    Some("""
      |WITH RECURSIVE
      |edges AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS src,
      |         CAST(c_nationkey AS BIGINT) + 10000 AS dst, 1.0 AS weight
      |  FROM customer
      |  UNION ALL
      |  SELECT CAST(c_nationkey AS BIGINT) + 10000, CAST(c_custkey AS BIGINT), 1.0
      |  FROM customer),
      |outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |trans2 AS (
      |  SELECT e.src, e.dst, e.weight / o.outw AS p
      |  FROM edges e JOIN outw o USING (src)
      |  UNION ALL
      |  SELECT node, node, 0.0 FROM nodes),
      |pr AS (
      |  SELECT 0 AS it, node,
      |    CAST(round(1000000000000.0 / n, 0) AS BIGINT) AS r FROM nodes, nn
      |  UNION ALL
      |  SELECT pr.it + 1, t.dst AS node,
      |    CAST(round((1.0 - 0.85) * 1000000000000.0 / max(nn.n)
      |      + 0.85 * (CAST(sum(CAST(round(CAST(pr.r AS DOUBLE) * t.p, 0)
      |          AS BIGINT)) AS DOUBLE) + 0.0), 0) AS BIGINT)
      |  FROM pr JOIN trans2 t ON pr.node = t.src, nn
      |  WHERE pr.it < 8
      |  GROUP BY pr.it, t.dst)
      |SELECT node, round(CAST(r AS DOUBLE) / 1000000000000.0, 9) AS rank
      |FROM pr WHERE it = 8
      |ORDER BY rank DESC, node
      |""".stripMargin))

  val all: Seq[Q] = Seq(q_fastrp_embed, q_multimodal_embed, q_pagerank)
}
