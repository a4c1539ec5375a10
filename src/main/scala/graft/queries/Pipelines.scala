package graft.queries

import graft.core.Tables
import graft.vectorize.{FastRP, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Pipeline-operator query entries that are NOT SQL-expressible and so get
  * rows-only driver checks (`oracle = None`); their numeric correctness is
  * asserted by closed-form ScalaTest specs instead (FastRPSpec,
  * MultimodalSpec — SURVEY.md §5.2).
  */
object Pipelines {

  /** FastRP node embeddings over the customer↔nation bipartite graph
    * derived from the `customer` table (nation nodes offset by 10_000 to
    * share the long id space), symmetrized as the reference does for
    * undirected input (radient/tasks/vectorizers/graph/fastrp.py:32-53).
    * No oracle: the iterative A·X float sums are partition-order
    * dependent; FastRPSpec pins the math against a local dense oracle. */
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

  val q_fastrp_embed = Q(
    "q_fastrp_embed",
    (s, dir) => {
      FastRP.embed(custNationEdges(s, dir), dim = 8)
        .select(col("node"), posexplode(col("vec")).as(Seq("pos", "vraw")))
        .select(col("node"), col("pos"), round(col("vraw"), 6).as("v"))
        .orderBy(col("node"), col("pos"))
    },
    None)

  /** Multimodal featurization: documents' text bytes treated as opaque
    * binary payloads, routed image/audio/video/text by id and featurized
    * through the per-partition stub decoders (Multimodal.featurize —
    * real Spark plumbing, stub decode; SURVEY.md §7.0). No oracle: the
    * mapPartitions decoders are not SQL-expressible; MultimodalSpec pins
    * the per-modality feature math. */
  val q_multimodal_embed = Q(
    "q_multimodal_embed",
    (s, dir) => {
      val docs = Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id").as("id"),
          element_at(array(lit("text"), lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 4 + 1).cast("int")).as("modality"),
          col("text").cast(BinaryType).as("data"),
          lit(null).cast(StringType).as("path"))
      Multimodal.featurize(docs, dim = 16)
        .select(col("id"), col("modality"),
          posexplode(col("embedding")).as(Seq("pos", "vraw")))
        .select(col("id"), col("modality"), col("pos"),
          round(col("vraw"), 6).as("v"))
        .orderBy(col("id"), col("pos"))
    },
    None)

  /** PageRank centrality over the same customer↔nation bipartite graph
    * as [[q_fastrp_embed]] — the "importance" signal a curation pass
    * weights sources by (domain authority at web scale). No oracle: the
    * per-round double sums are partition-order dependent; PageRankSpec
    * pins the math against a dense driver-side power iteration and the
    * rank-mass invariant (Σ rank = 1). Output rounded to 9 dp, hub
    * (nation) nodes first. */
  val q_pagerank = Q(
    "q_pagerank",
    (s, dir) => {
      graft.graph.PageRank.ranks(custNationEdges(s, dir), iters = 8)
        .select(col("node"), round(col("rank"), 9).as("rank"))
        .orderBy(desc("rank"), col("node"))
    },
    None)

  val all: Seq[Q] = Seq(q_fastrp_embed, q_multimodal_embed, q_pagerank)
}
