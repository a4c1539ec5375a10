package graft.index

import graft.TestSpark
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Union}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Compact.append]]: a continuous-ingest insert loop must keep the
  * Catalyst plan depth bounded (lineage truncation every
  * `Compact.DefaultEvery` appends) while producing exactly the content a
  * one-shot insert of the same rows would — the round-5 backlog item
  * (naive cached-union inserts grew one Union layer + one pinned cache
  * per batch without bound). */
class InsertCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def unionLayers(p: LogicalPlan): Int =
    p.collect { case u: Union => u }.size

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
  private lazy val base = emb.filter(col("vec_id") >= 100)
  private lazy val extra = emb.filter(col("vec_id") < 100)

  test("50 sequential IVF inserts: bounded plan depth, one-shot-equal content") {
    val m0 = IvfIndex.build(base, "vec_id", "embedding", k = 4)
    var m = m0
    (0 until 50).foreach { i =>
      m = IvfIndex.insert(m, extra.filter(col("vec_id") % 50 === i))
    }
    assert(m.appends == 50)
    assert(m.assign.count() == 500)
    // ≥3 compactions happened (appends 16/32/48) → far fewer Union
    // layers than inserts; without compaction this would be 50
    assert(unionLayers(m.assign.queryExecution.logical) < Compact.DefaultEvery)
    // frozen centroids → assignment is deterministic, so the loop must
    // land exactly the one-shot insert's content
    val oneShot = IvfIndex.insert(m0, extra)
    assert(m.assign.collect().map(_.toSeq).toSet ==
      oneShot.assign.collect().map(_.toSeq).toSet)
    // inserted rows are served through the compacted index
    val q = extra.filter(col("vec_id") === 7)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m.search(q, "qid", "qv", k = 1, nprobe = 4).collect()
    assert(top.length == 1 && top(0).getLong(1) == 7L)
  }

  test("PQ insert loop crosses a compaction boundary with codes intact") {
    val m0 = PqIndex.build(base, "vec_id", "embedding", m = 8, ksub = 16)
    var m = m0
    (0 until 20).foreach { i =>
      m = PqIndex.insert(m, extra.filter(col("vec_id") % 20 === i), "embedding")
    }
    assert(m.appends == 20)
    assert(m.codes.count() == 500)
    assert(unionLayers(m.codes.queryExecution.logical) < Compact.DefaultEvery)
    // frozen codebooks → codes deterministic; loop == one-shot
    val oneShot = PqIndex.insert(m0, extra, "embedding")
    assert(m.codes.collect().map(_.toSeq).toSet ==
      oneShot.codes.collect().map(_.toSeq).toSet)
  }

  test("disown lets one compacted state seed two append chains (single-consumer contract)") {
    import spark.implicits._
    def leafRdds(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val s0 = Seq((1L, "a")).toDF("id", "v").cache()
    // compactEvery = 1 → this append compacts: `state` is a
    // Compact-OWNED localCheckpoint
    val state = Compact.append(s0, Seq((2L, "b")).toDF("id", "v"),
      appends = 0, compactEvery = 1)
    assert(state.count() == 2)
    // transfer ownership to the caller, then fork into two chains
    Compact.disown(state)
    val a = Compact.append(state, Seq((3L, "c")).toDF("id", "v"), 1, 1)
    assert(a.count() == 3) // fork A compacted — would have released an owned parent
    // the shared parent's checkpoint blocks must have survived fork A's
    // compaction: its leaf RDD is still persisted and still readable
    leafRdds(state).foreach(r =>
      assert(r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "disowned parent checkpoint was released by a fork's compaction"))
    val b = Compact.append(state, Seq((4L, "d")).toDF("id", "v"), 1, 1)
    assert(b.count() == 3)
    assert(b.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }
}
