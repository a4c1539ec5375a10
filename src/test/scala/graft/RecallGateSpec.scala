package graft

import org.scalatest.funsuite.AnyFunSuite

/** The recall gate's CONFIGURATION is itself pinned: a new ANN entry
  * that never gets a floor, or a floor quietly dropped below the tier's
  * 0.8 line, would silently weaken the only check that can see
  * approximate-operator quality (the DuckDB oracle records rows-only
  * for them). The gate's runtime behavior is exercised by
  * `runMain graft.Recall` (nonzero exit on breach) and
  * scripts/check_recall.py against the persisted artifact.
  */
class RecallGateSpec extends AnyFunSuite {

  test("every q_ann_* index entry carries a recall floor, and nothing else does") {
    val annIndexEntries = (SparkEntry.queries.keySet
      .filter(_.startsWith("q_ann_")) - "q_ann_lsh_join") + // pair-join: own floor
      "q_stream_index_insert" + // the stream-maintained GANN serves ANN too
      "q_stream_index_insert_filtered" + // its filtered serving twin (r16)
      "q_stream_index_insert_ivf" + // the maintained-IVF serving path (r16)
      "q_stream_index_insert_ivf_filtered"
    assert(RecallReport.recallFloors.keySet == annIndexEntries,
      s"floors=${RecallReport.recallFloors.keySet} entries=$annIndexEntries")
  }

  test("floors hold the tier's line: recall >= 0.8, lsh >= 0.9, hll err <= 0.1") {
    RecallReport.recallFloors.foreach { case (nm, f) =>
      assert(f >= 0.8 && f <= 1.0, s"$nm floor $f outside the serving tier line")
    }
    assert(RecallReport.lshPairRecallFloor >= 0.9)
    assert(RecallReport.hllMaxRelErrCeil <= 0.1)
  }
}
