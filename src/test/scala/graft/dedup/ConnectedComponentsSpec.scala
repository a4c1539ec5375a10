package graft.dedup

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Label propagation must converge to min-reachable-id — checked against
  * a brute-force transitive closure on known graph shapes (the worst case
  * for propagation is a long chain; the common dedup case is a clique).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Runs BOTH paths (driver union-find and, via driverThreshold = 0,
    * the distributed propagation) and asserts they agree before returning
    * the labels. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val uf = ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b", driverThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == prop, "union-find and propagation paths disagree")
    uf
  }

  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(s: Long): Set[Long] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
      }
      seen
    }
    adj.keys.map(n => n -> reach(n).min).toMap
  }

  test("chain collapses to its minimum id") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got == oracle(chain))
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint cliques and a chain keep separate labels") {
    val cliqueA = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val cliqueB = for (i <- 20L to 22L; j <- (i + 1) to 22L) yield (i, j)
    val chain = Seq((30L, 31L), (31L, 32L))
    val edges = cliqueA ++ cliqueB ++ chain
    val got = run(edges)
    assert(got == oracle(edges))
    assert(got(13L) == 10L && got(22L) == 20L && got(32L) == 30L)
  }

  test("bridge edge merges two cliques") {
    val cliqueA = for (i <- 0L to 2L; j <- (i + 1) to 2L) yield (i, j)
    val cliqueB = for (i <- 5L to 7L; j <- (i + 1) to 7L) yield (i, j)
    val edges = cliqueA ++ cliqueB :+ ((2L, 5L))
    val got = run(edges)
    assert(got == oracle(edges))
    assert(got.values.toSet == Set(0L))
  }
}
