package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step between "near-duplicate PAIRS" and "keep ONE representative per
  * duplicate cluster" that a training-data dedup pipeline runs after any
  * of the pair generators (MinHash/SimHash/embedding joins). Labels every
  * node with the MINIMUM node id reachable from it, which is
  * deterministic and makes the representative choice ("keep the smallest
  * id") implicit in the label.
  *
  * Two result-identical paths, chosen by the deduped edge count:
  *
  *  - **Driver union-find** (edges ≤ `driverThreshold`, default 2^20):
  *    verified near-dup pair sets are a tiny fraction of the corpus (512
  *    pairs across 5 000 docs in the sf0.1 fixture), and the distributed
  *    loop's per-round job latency dwarfs the work. 2^20 edges collect to
  *    ~16 MB of longs — bounded driver memory, exact same labels.
  *  - **Distributed min-label propagation** with a pointer-jumping
  *    shortcut (the general case): per round every node takes the min of
  *    its own and its neighbours' labels (equi-join + min-aggregate),
  *    then labels are re-pointed through themselves (`comp ← label(comp)`)
  *    — hooking + shortcutting, so convergence is O(log diameter) rounds
  *    rather than O(diameter).
  *
  * Scale shape of the distributed path: every round shuffles only
  * (id, label) longs — never payloads; the edge list is cached once and
  * reused; each round's label table is materialized with an EAGER
  * localCheckpoint, which truncates the logical plan to a leaf. A cache()
  * is not enough here: the round's plan references the previous round's
  * frame 3-4 times (messages, union, shortcut, change-check), so lineage
  * grows ~4^rounds and Catalyst analysis hangs after a handful of rounds
  * even though every run is cached (the GannIndex round-1 lesson,
  * iterated). On a real cluster the same role is played by checkpointing
  * to reliable storage.
  */
object ConnectedComponents {

  /** (id, comp) for every node that appears in `edges`; comp = min id of
    * the node's component. Nodes not present in any edge are absent —
    * callers union singletons back with comp = own id. */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, driverThreshold: Long = 1L << 20): DataFrame = {
    val pairs = edges.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .distinct()
      .cache()
    val nEdges = pairs.count()
    val out =
      if (nEdges <= driverThreshold) driverUnionFind(pairs)
      else propagate(pairs, maxIter)
    pairs.unpersist()
    out
  }

  /** Collect the (small) edge set and solve exactly with union-find
    * (path compression + union by min root), then ship the labels back
    * as a DataFrame. */
  private def driverUnionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) {
        val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
      }
      r
    }
    val edgeArr = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((u, v) <- edgeArr) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        // union by MIN root id — the root IS the component label
        if (ru < rv) parent(rv) = ru else parent(ru) = rv
      }
      parent.getOrElseUpdate(u, find(u)); parent.getOrElseUpdate(v, find(v))
    }
    val nodes = edgeArr.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => (n, find(n))).toSeq.toDF("id", "comp")
  }

  /** Distributed min-label propagation + pointer jumping. */
  private def propagate(pairs: DataFrame, maxIter: Int): DataFrame = {
    val sym = pairs
      .union(pairs.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .cache()
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // hook: every node adopts the min label among itself + neighbours
      val msgs = sym.join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .select(col("v").as("id"), col("comp"))
      // lazy cache, not an eager checkpoint: the shortcut below references
      // hooked twice, so the first action computes it once and the second
      // reference reads the cache — one materialization per round, and its
      // plan is depth-1 off the checkpointed labels leaf
      val hooked = labels.union(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .cache()
      // shortcut: re-point each label at its label's label — labels are
      // always node ids, so the self-join resolves every row (the left
      // join + coalesce only guards the not-yet-consistent mid-rounds)
      val next = hooked.as("x")
        .join(hooked.select(col("id").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("id"), coalesce(col("comp2"), col("comp")).as("comp"))
        .localCheckpoint(true)
      val changed = labels.as("l")
        .join(next.as("n"), Seq("id"))
        .filter(col("l.comp") =!= col("n.comp"))
        .limit(1).count()
      hooked.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
