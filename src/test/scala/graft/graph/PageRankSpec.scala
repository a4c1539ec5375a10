package graft.graph

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** PageRank correctness vs a local dense power iteration of the exact
  * same recurrence (damping, dangling redistribution, fixed rounds), plus
  * the rank-mass invariant and determinism across runs.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // weighted digraph with a dangling node (4 has no out-edges) and an
  // asymmetric hub (2 receives from three nodes)
  private val edges: Seq[(Long, Long, Double)] = Seq(
    (0L, 1L, 1.0), (0L, 2L, 2.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
    (3L, 2L, 0.5), (3L, 4L, 0.5))
  private val damping = 0.85
  private val iters = 12

  private def localPageRank(): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val idx = nodes.zipWithIndex.toMap
    val outw = Array.fill(n)(0.0)
    edges.foreach { case (s, _, w) => outw(idx(s)) += w }
    var rank = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val dangling = nodes.indices.collect {
        case i if outw(i) == 0.0 => rank(i)
      }.sum
      val msgs = Array.fill(n)(0.0)
      edges.foreach { case (s, d, w) =>
        msgs(idx(d)) += rank(idx(s)) * w / outw(idx(s))
      }
      rank = nodes.indices.map(i =>
        (1 - damping) / n + damping * (msgs(i) + dangling / n)).toArray
    }
    nodes.map(nd => nd -> rank(idx(nd))).toMap
  }

  private def sparkRanks(): Map[Long, Double] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst", "weight")
    PageRank.ranks(df, iters = iters, damping = damping)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("matches the dense power iteration on every node") {
    val local = localPageRank()
    val dist = sparkRanks()
    assert(dist.keySet == local.keySet)
    local.foreach { case (node, r) =>
      assert(math.abs(dist(node) - r) < 1e-9,
        s"node $node: spark ${dist(node)} vs local $r")
    }
  }

  test("rank mass is conserved: sum of ranks = 1") {
    val dist = sparkRanks()
    assert(math.abs(dist.values.sum - 1.0) < 1e-9)
  }

  test("hub ordering: the shared sink outranks its sources") {
    val dist = sparkRanks()
    assert(dist(2L) > dist(1L) && dist(2L) > dist(3L))
  }

  test("deterministic across invocations") {
    assert(sparkRanks() == sparkRanks())
  }

  test("superseded round checkpoints are released: storage stays bounded") {
    // 12 rounds × localCheckpoint must NOT pin 12 rank RDDs: round N−1 is
    // released when round N materializes (Caches.releaseMaterialized —
    // plain unpersist cannot reach localCheckpoint blocks). Allowance of
    // 2: the final rank checkpoint (caller-owned) plus one async
    // unpersist still in flight.
    import spark.implicits._
    val df = edges.toDF("src", "dst", "weight")
    val before = spark.sparkContext.getPersistentRDDs.size
    val r = PageRank.ranks(df, iters = 12, damping = damping)
    r.collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2, s"pinned RDDs grew $before -> $after")
    graft.core.Caches.releaseMaterialized(r)
  }

  test("q_pagerank entry runs: nation hubs outrank customers") {
    val rows = graft.queries.Pipelines.q_pagerank
      .run(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    // ranks sum to ~1 after 9-dp rounding
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass $total")
    // the top-ranked node is a nation hub (id >= 10000): every customer
    // points at one of 25 nations, so hub in-mass dominates
    assert(rows.head.getLong(0) >= 10000L)
  }
}
