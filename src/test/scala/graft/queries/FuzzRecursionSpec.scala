package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential soak for [[FuzzRecursion]]: every seeded `WITH
  * RECURSIVE` plan run on Spark's UnionLoop plan must equal the
  * driver-side Scala BFS over collected arrays (zero Catalyst in the
  * loop). SPARK_GRAFT_FUZZ_RECURSION raises the seed count; the driver
  * seeds additionally run under the DuckDB oracle via the `q_fuzzr_*`
  * registry entries.
  */
class FuzzRecursionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(seed: Long): Unit = {
    val p = FuzzRecursion.RPlan(seed)
    val sq = p.runSpark(spark, TestSpark.sf0001).collect()
      .map(_.toString).toSeq
    val bf = p.runBfs(spark, TestSpark.sf0001).collect()
      .map(_.toString).toSeq
    assert(sq == bf,
      s"seed $seed diverged (${p.describe}): recursive ${sq.size} rows vs " +
        s"BFS ${bf.size};\nrecursive head=${sq.take(3)}\nbfs head=${bf.take(3)}")
    info(s"seed $seed ok (${sq.size} rows): ${p.describe}")
  }

  private val nPlans =
    sys.env.get("SPARK_GRAFT_FUZZ_RECURSION").map(_.toInt).getOrElse(10)

  test(s"$nPlans seeded recursive plans: UnionLoop equals the " +
      "driver-side BFS") {
    (1 to nPlans).foreach(s => check(s.toLong))
  }

  test("driver seeds: UnionLoop equals the driver-side BFS") {
    FuzzRecursion.driverSeeds.foreach(check)
  }

  test("driver seeds cover all three topologies off the hand entries' " +
      "pinned parameters") {
    val ds = FuzzRecursion.driverSeeds.map(FuzzRecursion.RPlan)
    ds.foreach(p => info(s"seed ${p.seed}: ${p.describe}"))
    assert(ds.map(_.topo).toSet == Set(0, 1, 2), "one seed per topology")
    assert(ds.exists(p => p.topo == 0 && p.fan != 2),
      "the tree seed must move the fan-in off the hand entry's binary heap")
    assert(ds.exists(p => p.topo == 0 && p.carry),
      "the tree seed must carry the DECIMAL path sum through the recursion")
    assert(ds.exists(p => p.topo == 2 &&
        (p.startNode != 0 || p.chordMul != 2 || p.depthCap != 12)),
      "the graph seed must move off the hand entry's node-0/×2/cap-12 walk")
    // round 16: the UNION-distinct axis — one driver seed must run the
    // composed frontier-dedup loop against DuckDB's native UNION
    // recursion, off the hand q_recursive_reach entry's ×2/start-5 point
    assert(ds.exists(p => p.reach && (p.chordMul != 2 || p.startNode != 5)),
      "one driver seed must draw graph-REACH on non-hand parameters")
    assert(ds.exists(p => p.topo == 2 && !p.reach),
      "the UNION ALL path-count graph seed must survive the reach axis")
  }
}
