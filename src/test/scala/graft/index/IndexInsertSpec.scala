package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental insert (frozen quantizers) — the streaming-ingest half of
  * the reference's insert → index → search lifecycle. */
class IndexInsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
  private lazy val base = emb.filter(col("vec_id") >= 100)
  private lazy val extra = emb.filter(col("vec_id") < 100)

  test("IVF insert appends to posting lists and makes new ids searchable") {
    val m0 = IvfIndex.build(base, "vec_id", "embedding", k = 8)
    val m1 = IvfIndex.insert(m0, extra)
    assert(m1.assign.count() == 500)
    assert(m1.assign.select("vec_id").distinct().count() == 500)
    // centroids frozen — old rows keep their clusters
    val before = m0.assign.select("vec_id", "cluster").collect().map(_.toSeq).toSet
    val after = m1.assign.filter(col("vec_id") >= 100)
      .select("vec_id", "cluster").collect().map(_.toSeq).toSet
    assert(before == after)
    // probing all clusters is exact — an inserted vector's own id is its
    // 0-distance nearest neighbour
    val q = extra.filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val hits = m1.search(q, "qid", "qv", k = 1, nprobe = 8)
      .filter(col("qid") === col("vec_id"))
    assert(hits.count() == 0) // self excluded by search
    val top = m1.search(
      extra.filter(col("vec_id") === 7)
        .select(lit(9999L).as("qid"), col("embedding").as("qv")),
      "qid", "qv", k = 1, nprobe = 8).collect()
    assert(top.length == 1 && top(0).getLong(1) == 7L) // finds the inserted row
  }

  test("IVF-PQ insert assigns+encodes against frozen centroids and books") {
    val m0 = IvfPq.build(base, "vec_id", "embedding", kCoarse = 8, m = 8, ksub = 16)
    val m1 = IvfPq.insert(m0, extra, "embedding")
    assert(m1.codes.count() == 500)
    assert(m1.codes.select("vec_id").distinct().count() == 500)
    // frozen quantizers: old rows' (cluster, codes) untouched
    val before = m0.codes.orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val after = m1.codes.filter(col("vec_id") >= 100).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    assert(before == after)
    // an inserted row is served through the probed posting lists
    val q = extra.filter(col("vec_id") === 3)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m1.search(q, "qid", "qv", k = 1, nprobe = 8).collect()
    assert(top.length == 1 && top(0).getLong(1) == 3L)
  }

  test("GANN insert routes through the frozen forest, spill band included") {
    val m0 = GannIndex.build(base, "vec_id", "embedding",
      leafSize = 64, spill = 0.15, nTrees = 2)
    val m1 = GannIndex.insert(m0, extra)
    // every inserted id present in every tree at least once
    val perTree = m1.assign.filter(col("vec_id") < 100)
      .select("tree", "vec_id").distinct()
      .groupBy("tree").count().collect()
    assert(perTree.length == 2 && perTree.forall(_.getLong(1) == 100))
    // old rows' assignment untouched
    assert(m1.assign.filter(col("vec_id") >= 100).count() == m0.assign.count())
    // frozen planes: an inserted vector is findable
    val top = m1.search(
      extra.filter(col("vec_id") === 7)
        .select(lit(9999L).as("qid"), col("embedding").as("qv")),
      "qid", "qv", k = 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 7L)
  }

  test("PQ insert encodes with frozen codebooks — codes match a direct encode") {
    val m0 = PqIndex.build(base, "vec_id", "embedding", m = 8, ksub = 16)
    val m1 = PqIndex.insert(m0, extra, "embedding")
    assert(m1.codes.count() == 500)
    assert(m1.codes.select("vec_id").distinct().count() == 500)
    // codebooks are unchanged objects — re-encoding base rows through the
    // inserted model reproduces the original codes bit-for-bit
    val direct = m0.codes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq
    val viaInsert = m1.codes.filter(col("vec_id") >= 100)
      .orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq
    assert(direct == viaInsert)
    // inserted rows rank their own vector at ADC distance ~0
    val q = extra.filter(col("vec_id") === 3)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m1.search(q, "qid", "qv", k = 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 3L)
  }
}
