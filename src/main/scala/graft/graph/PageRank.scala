package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration over a weighted edge list — the graph
  * centrality companion to [[graft.vectorize.FastRP]] (same `A·x`
  * message-passing core, scalar state instead of a vector): per round
  * every node sends `rank · w/outw` along its out-edges (one equi-join +
  * one map-side-combined sum), dangling mass is folded back uniformly,
  * and `rank ← (1−d)/n + d·(msgs + dangling/n)`.
  *
  * Scale shape: the (src, dst, p) transition table is cached once and
  * re-joined each round; every round shuffles only (node, double) pairs —
  * never payloads. Each round's rank frame is materialized with an EAGER
  * `localCheckpoint` so lineage stays one round deep (the
  * [[graft.dedup.ConnectedComponents]] lesson: the frame is referenced
  * by both the dangling aggregate and the next round's join, so an
  * uncheckpointed chain doubles per round). The dangling aggregate is
  * the per-round driver action that GraphX's Pregel also pays; on a real
  * cluster the localCheckpoint becomes a reliable checkpoint every few
  * rounds.
  */
object PageRank {

  /** (node, rank) for every node appearing in `edges` (src, dst, weight);
    * ranks sum to 1. Fixed iteration count — deterministic output shape
    * regardless of convergence, the form a scheduled corpus-refresh job
    * wants. */
  def ranks(edgesIn: DataFrame, iters: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val edges = edgesIn.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"),
      col("weight").cast("double").as("weight")).cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    // iterative-shuffle parallelism tracks the NODE table (the frames the
    // loop re-shuffles), not the session's scan parallelism: at 15 k
    // nodes a 32-partition round is pure task overhead, at 1 B nodes the
    // session default is the cap. Scoped to this call like the streaming
    // entries' state-partition override; restored before returning.
    val spark = edgesIn.sparkSession
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(4L, math.min(prevParts.toLong, n / 20000L + 1L))
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // released in the finally: a failed round (executor loss, OOM in a
    // dangling collect) must not leave four frames pinned in storage
    val pinned = scala.collection.mutable.Buffer[DataFrame](edges, nodes)
    try {
    val outw = edges.groupBy("src").agg(sum("weight").as("outw"))
    // repartitioned to the loop's parallelism before caching: the scan
    // may have many small input splits, and every round re-reads these
    // cached partitions — task count per round should match `parts`
    val trans = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("weight") / col("outw")).as("p"))
      .repartition(parts.toInt, col("src"))
      .cache()
    // nodes with no out-edges: their rank leaks unless redistributed.
    // Counted once up front — a sink-free graph (the common symmetrized
    // case) skips the per-round dangling aggregate entirely, halving the
    // driver-job count of the loop.
    val sinks = nodes.join(outw.select(col("src").as("node")),
      Seq("node"), "left_anti").cache()
    pinned += trans; pinned += sinks
    val hasSinks = sinks.limit(1).count() > 0
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val dangling = if (!hasSinks) 0.0
        else sinks.join(rank, Seq("node"))
          .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val msgs = trans.join(rank, trans("src") === rank("node"))
        .select(trans("dst").as("node"), (col("rank") * col("p")).as("c"))
        .groupBy("node").agg(sum("c").as("m"))
      rank = nodes.join(msgs, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint(true)
    }
    rank
    } finally {
      pinned.foreach(f => { f.unpersist(); () })
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
