package graft.vectorize

import graft.functions.TextF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastRP node embeddings (Chen et al. 2019) as distributed message
  * passing — the Spark-native re-expression of the reference's sparse
  * matmul chain (radient/tasks/vectorizers/graph/fastrp.py:32-53):
  *
  *   R    = sparse random projection rows (one per node, seeded hash)
  *   L    = diag(0.5 · deg^β / n)
  *   N_1  = A·L·R
  *   out  = Σ_k weights[k] · N_k,  N_{k+1} = A·N_k
  *
  * Each `A·X` is one join edges⋈X on dst + one groupBy(src) vector-sum
  * (MLlib Summarizer — single shuffle, map-side partial aggregation).
  * The projection matrix R is never materialized on the driver: each row
  * is a deterministic function of (node, component, seed) via TextF.h32,
  * mirroring sklearn's SparseRandomProjection density 1/√d with values
  * ±√(1/density)/√d (fastrp.py:31 defaults).
  *
  * Vector state is INTEGER micros carried in doubles (round 10, the
  * PageRank discipline): the init row and every per-edge contribution
  * are rounded to whole micros, so every Summarizer sum adds
  * integer-valued doubles far below 2⁵³ — exact in ANY partition order —
  * and the final division by 10⁶ is the only non-integer step. That is
  * what moves `q_fastrp_embed` from rows-only to HASH-CHECKED against a
  * DuckDB oracle that replays the same four propagation stages as
  * chained CTEs over the exploded (node, pos, value) form. Quantization
  * is ≤0.5 micro per edge per stage (the reference's float path and
  * this one agree to ~1e-6 per stage — far inside embedding-quality
  * noise); FastRPSpec's dense oracle applies the identical rounding and
  * asserts EXACT equality.
  */
object FastRP {

  /** Seeded sparse-random-projection row for a node id column. */
  def projectionRow(node: Column, dim: Int, seed: Long): Column = {
    val density = 1.0 / math.sqrt(dim)
    val s = math.sqrt(1.0 / density) / math.sqrt(dim)
    transform(sequence(lit(0), lit(dim - 1)), k => {
      val u = (TextF.h32(concat(lit(s"rp$seed#"), node.cast("string"),
        lit("#"), k.cast("string"))) % 1000000L).cast("double") / 1000000.0
      when(u < density / 2, lit(s))
        .when(u < density, lit(-s))
        .otherwise(lit(0.0))
    })
  }

  /** Exact elementwise vector sum per key: one per-dimension `sum`
    * column per component, reassembled into an array — ONE shuffle,
    * plain codegen HashAggregate over fixed-width doubles. The inputs
    * are integer-valued micros, and a plain double sum of integers
    * below 2⁵³ is exact in ANY order — unlike MLlib `Summarizer.sum`,
    * which tracks an incremental MEAN and returns mean·count (measured
    * 2e-10-level drift, enough to break the hash-exact oracle). */
  private def vecSum(df: DataFrame, key: Column, arr: Column,
      dim: Int): DataFrame = {
    val pre = df.select(key.as("node"), arr.as("_a"))
    val sums = (0 until dim).map(k => sum(col("_a").getItem(k)).as(s"_s$k"))
    pre.groupBy(col("node"))
      .agg(sums.head, sums.tail: _*)
      .select(col("node"),
        array((0 until dim).map(k => col(s"_s$k")): _*).as("vec"))
  }

  /** A·X: propagate `vec` from dst to src along weighted edges and sum.
    * Per-edge contributions round to whole micros BEFORE the sum (the
    * cross-engine exactness step — mirrored op-for-op in the oracle's
    * `round(v * weight, 0)`), so the vector sum adds integer-valued
    * doubles: exact on any partitioning. */
  private def propagate(edges: DataFrame, x: DataFrame, dim: Int): DataFrame =
    vecSum(
      edges.join(x, edges("dst") === x("node")),
      edges("src"),
      transform(col("vec"), v => round(v * col("weight"), 0)),
      dim)

  /** Node embeddings for a weighted edge list (src, dst, weight).
    * Directed propagation like the reference's A @ X; pass a symmetrized
    * edge list for undirected graphs. */
  def embed(edgesIn: DataFrame, dim: Int = 64,
      weights: Seq[Double] = Seq(0.1, 0.2, 1.0, 3.0),
      beta: Double = 0.0, seed: Long = 42L): DataFrame = {
    // cached: the edge list feeds every propagate iteration (weights.size
    // scans) plus the degree/node derivations — without materialization
    // each iteration re-reads the upstream source
    val edges = edgesIn.cache()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    // L[j] = 0.5 * deg(j)^beta / n  (out-degree = row sum of A)
    val deg = edges.groupBy(col("src").as("node"))
      .agg(sum(col("weight")).as("deg"))
    val lr = nodes.join(deg, Seq("node"), "left")
      .select(col("node"),
        transform(projectionRow(col("node"), dim, seed),
          v => round(v * (lit(0.5) * pow(coalesce(col("deg"), lit(0.0)).cast("double"), beta) / n)
            * lit(1e6), 0))
          .as("vec"))
    // Every N_k is cached and NOT unpersisted until the result is done:
    // each N_k's plan appears both inside N_{k+1} and inside the running
    // weighted sum, so without a live cache the final action re-derives
    // N_1 once per remaining iteration (quadratic recompute). The caches
    // populate lazily during the single final action — no per-iteration
    // count() barrier (k extra jobs) is needed for the reuse to kick in.
    var nk = propagate(edges, lr, dim).cache() // N_1 = A·L·R
    val intermediates = scala.collection.mutable.Buffer(edges, nodes, nk)
    // the weighted combine Σ_k w_k·N_k is ONE union + vector-sum shuffle
    // over the cached N_k frames, not a chain of per-iteration full-outer
    // joins — the propagate chain is inherently sequential, but the
    // combine isn't, and k−1 join stages collapse into a single groupBy.
    // (Nodes absent from an N_k simply contribute no term, which is what
    // the old null-handling axpy computed.)
    val terms = scala.collection.mutable.Buffer(
      nk.select(col("node"),
        transform(col("vec"), v => round(v * weights.head, 0)).as("wv")))
    for (w <- weights.tail) {
      nk = propagate(edges, nk, dim).cache()
      intermediates += nk
      terms += nk.select(col("node"),
        transform(col("vec"), v => round(v * w, 0)).as("wv"))
    }
    // still integer-valued micros through the weighted sum; the single
    // ÷10⁶ below is the only non-integer step in the whole pipeline
    val result = vecSum(terms.reduce(_ union _), col("node"), col("wv"), dim)
    // nodes that received no messages get the zero vector
    val out = graft.core.Caches.cached(
      nodes.join(result, Seq("node"), "left")
        .select(col("node"),
          coalesce(transform(col("vec"), v => v / lit(1e6)),
            transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0))).as("vec")))
    // materialize the result, then release every intermediate cache — an
    // embed() in a long-lived session must not pin k+2 frames forever
    // (callers may unpersist the returned frame when done with it, or
    // release everything engine-pinned via graft.core.Caches.clear)
    out.count()
    intermediates.foreach(_.unpersist())
    out
  }
}
