package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential soak for [[FuzzStream]]: every seeded plan's multi-batch
  * streaming replay must equal the identical DataFrame plan run in batch
  * (with the append-mode finalized-set cutoff applied from the same
  * watermark arithmetic). SPARK_GRAFT_FUZZ_STREAMS raises the seed count
  * for soak runs; the fixed driver seeds additionally run under the
  * DuckDB oracle via the `q_fuzzst_*` registry entries.
  */
class FuzzStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val nPlans =
    sys.env.get("SPARK_GRAFT_FUZZ_STREAMS").map(_.toInt).getOrElse(12)

  test(s"$nPlans seeded streaming plans: stream replay equals batch") {
    (1 to nPlans).foreach { seed =>
      val p = FuzzStream.SPlan(seed.toLong)
      val st = p.runStream(spark, TestSpark.sf0001).collect()
        .map(_.toString).toSeq
      val bt = p.runBatch(spark, TestSpark.sf0001).collect()
        .map(_.toString).toSeq
      assert(st == bt,
        s"seed $seed diverged (${p.describe}): stream ${st.size} rows vs " +
          s"batch ${bt.size};\nstream head=${st.take(3)}\nbatch head=${bt.take(3)}")
      info(s"seed $seed ok (${st.size} rows): ${p.describe}")
    }
  }

  private val nJoinPlans =
    sys.env.get("SPARK_GRAFT_FUZZ_STREAM_JOINS").map(_.toInt).getOrElse(8)

  test(s"$nJoinPlans seeded stream-stream join plans: stream replay " +
      "equals batch") {
    (1 to nJoinPlans).foreach { seed =>
      val p = FuzzStream.JPlan(seed.toLong)
      val st = p.runStream(spark, TestSpark.sf0001).collect()
        .map(_.toString).toSeq
      val bt = p.runBatch(spark, TestSpark.sf0001).collect()
        .map(_.toString).toSeq
      assert(st == bt,
        s"join seed $seed diverged (${p.describe}): stream ${st.size} rows " +
          s"vs batch ${bt.size};\nstream head=${st.take(3)}\nbatch head=${bt.take(3)}")
      info(s"join seed $seed ok (${st.size} rows): ${p.describe}")
    }
  }

  test("join driver seeds span all three join types, both delays, and " +
      "the I != D regime") {
    val ds = FuzzStream.joinDriverSeeds.map(FuzzStream.JPlan)
    ds.foreach(p => info(s"join seed ${p.seed}: ${p.describe}"))
    assert(ds.map(_.joinType).toSet ==
      Set("inner", "leftOuter", "fullOuter"))
    assert(ds.map(_.delayMin).toSet == Set(10, 30))
    assert(ds.exists(p => p.intervalMin != p.delayMin),
      "at least one I != D seed (the eviction bounds differ only then)")
    assert(ds.forall(p => p.leftType != p.rightType))
  }

  test("driver seeds span both output modes, filters, and key arities") {
    val ds = FuzzStream.driverSeeds.map(FuzzStream.SPlan)
    ds.foreach(p => info(s"seed ${p.seed}: ${p.describe}"))
    assert(ds.exists(_.append) && ds.exists(!_.append),
      "driver seeds must cover both output modes")
    assert(ds.exists(_.filtKind != 0), "at least one filtered seed")
    assert(ds.exists(p => p.keyEvent || p.userMod.nonEmpty),
      "at least one keyed seed")
    assert(ds.exists(_.sumVal), "at least one DECIMAL-sum seed")
    assert(ds.exists(p => !p.isSession && p.slideMin < p.winMin),
      "at least one SLIDING seed")
    assert(ds.exists(p => !p.isSession && p.slideMin < p.winMin && p.append),
      "at least one sliding APPEND seed (watermark cutoff over " +
        "overlapping windows)")
    assert(ds.exists(p => p.isSession && p.append) &&
      ds.exists(p => p.isSession && !p.append),
      "session seeds in BOTH output modes (watermark-gated session " +
        "finalization + the batch-equality complete form)")
  }
}
