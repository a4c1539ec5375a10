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
}
