package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential soak for [[FuzzDedup]]: every seeded admission plan's
  * multi-micro-batch stateful replay must equal the independent
  * batch-window formulation (ntile chunks + earlier-chunk joins — no
  * state machinery) of the same rule. SPARK_GRAFT_FUZZ_DEDUP raises the
  * seed count for soak runs; the fixed driver seeds additionally run
  * under the DuckDB oracle via the `q_fuzzsd_*` registry entries.
  */
class FuzzDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(seed: Long): Unit = {
    val p = FuzzDedup.DPlan(seed)
    val st = p.runStream(spark, TestSpark.sf0001).collect()
      .map(_.toString).toSeq
    val bt = p.runBatch(spark, TestSpark.sf0001).collect()
      .map(_.toString).toSeq
    assert(st == bt,
      s"seed $seed diverged (${p.describe}): stream ${st.size} rows vs " +
        s"batch ${bt.size};\nstream head=${st.take(3)}\nbatch head=${bt.take(3)}")
    info(s"seed $seed ok (${st.size} admitted): ${p.describe}")
  }

  private val nPlans =
    sys.env.get("SPARK_GRAFT_FUZZ_DEDUP").map(_.toInt).getOrElse(6)

  test(s"$nPlans seeded admission plans: stateful replay equals the " +
      "batch-window formulation") {
    (1 to nPlans).foreach(s => check(s.toLong))
  }

  test("driver seeds: stateful replay equals the batch-window " +
      "formulation") {
    FuzzDedup.driverSeeds.foreach(check)
  }

  test("driver seeds cover all four tiers and the axes the hand-written " +
      "entries pin to one point") {
    val ds = FuzzDedup.driverSeeds.map(FuzzDedup.DPlan)
    ds.foreach(p => info(s"seed ${p.seed}: ${p.describe}"))
    assert(ds.map(_.tier).toSet == Set(0, 1, 2, 3),
      "one driver seed per tier")
    assert(ds.exists(p => p.tier == 0 && p.verifyT != Dedup.MINHASH_VERIFY_T),
      "the LSH seed must move the verify threshold off the pinned 0.7")
    assert(ds.exists(p => p.tier == 1 && p.maxDf < 50L),
      "the winnow seed must tighten the df cap below the pinned 50")
    assert(ds.exists(p => p.tier == 2 && p.tau != ((4, 5)) &&
        p.strategy != "auto"),
      "the containment seed must move tau off 4/5 and force a strategy")
    assert(ds.exists(_.chunks != 4),
      "at least one seed off the pinned 4-chunk replay")
    assert(ds.exists(_.docMod.nonEmpty) && ds.exists(_.docMod.isEmpty),
      "both full and residue-narrowed corpora among the driver seeds")
    assert(ds.exists(p => p.restartAfter.nonEmpty && p.foldAtRestart) &&
      ds.exists(p => p.restartAfter.nonEmpty && !p.foldAtRestart),
      "driver seeds must run exactly-once recovery both WITH and " +
        "WITHOUT a compaction fold at the restart boundary")
    // round 16 — the state-LAYOUT axes: both posting bucket counts
    // (8 = saturated/isin-skip read, 256 = pruned isin read) and a
    // repeated fold cadence must run under the driver oracle
    assert(ds.map(_.postBuckets).toSet == Set(8, 256),
      "driver seeds must cover both posting-bucket layouts")
    assert(ds.exists(_.foldEvery.nonEmpty),
      "at least one driver seed must fold state on a cadence")
  }
}
