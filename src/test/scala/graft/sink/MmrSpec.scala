package graft.sink

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two queries; query 0's top-2 by relevance are near-duplicates of
  // each other, so a relevance-only top-3 picks both while MMR must
  // skip the duplicate until diversity allows it
  private def cands = Seq(
    // (qid, id, rel, emb)
    (0L, 1L, 0.99, Seq(1.0, 0.0, 0.0)),
    (0L, 2L, 0.98, Seq(0.999, 0.01, 0.0)), // near-dup of id 1
    (0L, 3L, 0.80, Seq(0.0, 1.0, 0.0)),
    (0L, 4L, 0.70, Seq(0.0, 0.0, 1.0)),
    (1L, 10L, 0.90, Seq(1.0, 0.0, 0.0)),
    (1L, 11L, 0.50, Seq(0.0, 1.0, 0.0))
  ).toDF("qid", "id", "rel", "emb")

  test("per-query groups are independent and step-complete") {
    val out = Mmr.diversify(cands, "qid", "id", "rel", "emb", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    assert(byQ(0L).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L)) // steps 1..3
    assert(byQ(1L).map(_._2).sorted.toSeq == Seq(1L, 2L))     // only 2 cands
    // no id picked twice within a query
    assert(byQ(0L).map(_._3).distinct.length == 3)
  }

  test("first pick is the relevance argmax; diversity displaces the near-dup") {
    val out = Mmr.diversify(cands, "qid", "id", "rel", "emb", k = 3)
      .filter(col("qid") === 0L).orderBy("step")
      .collect().map(_.getLong(2))
    assert(out(0) == 1L)      // pure relevance at step 1
    assert(out(1) == 3L)      // NOT the near-duplicate id 2
    assert(out(2) == 4L)      // diversity keeps displacing it
  }

  test("wDiv = 0 degenerates to relevance ranking") {
    val out = Mmr.diversify(cands, "qid", "id", "rel", "emb", k = 3,
        wRel = 1.0, wDiv = 0.0)
      .filter(col("qid") === 0L).orderBy("step")
      .collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 2L, 3L)) // plain top-3 by rel
  }

  test("all-NaN scores stop the selection instead of throwing") {
    // NaN rel everywhere → no comparable candidate at step 1; the greedy
    // loop must return an empty pick list, not IndexOutOfBounds
    val nanRel = Seq(
      (0L, 1L, Double.NaN, Seq(1.0, 0.0)),
      (0L, 2L, Double.NaN, Seq(0.0, 1.0))
    ).toDF("qid", "id", "rel", "emb")
    assert(Mmr.diversify(nanRel, "qid", "id", "rel", "emb", k = 2).count() == 0)
    // one NaN rel among valid candidates: valid ones picked, then stop —
    // no IndexOutOfBounds on the exhausted tail
    val mixed = Seq(
      (0L, 1L, 0.9, Seq(1.0, 0.0)),
      (0L, 2L, Double.NaN, Seq(0.0, 1.0))
    ).toDF("qid", "id", "rel", "emb")
    val picks = Mmr.diversify(mixed, "qid", "id", "rel", "emb", k = 2)
      .orderBy("step").collect().map(_.getLong(2))
    assert(picks.toSeq == Seq(1L))
    // degenerate zero embeddings: cosine is NaN, but the max-sim guard
    // (`c > ms`) skips NaN, so the diversity term degrades to "none" and
    // selection falls back to relevance order — no crash, k picks
    val zeroEmb = Seq(
      (0L, 1L, 0.9, Seq(0.0, 0.0)),
      (0L, 2L, 0.8, Seq(0.0, 0.0))
    ).toDF("qid", "id", "rel", "emb")
    val zp = Mmr.diversify(zeroEmb, "qid", "id", "rel", "emb", k = 2)
      .orderBy("step").collect().map(_.getLong(2))
    assert(zp.toSeq == Seq(1L, 2L))
  }
}
