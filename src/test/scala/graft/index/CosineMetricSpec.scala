package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cosine metric across the index tier: build with metric = "cosine"
  * unit-normalizes the corpus at encode time and the query batch at
  * search time, so every L2 kernel ranks by cosine
  * (||u−v||² = 2(1−cosθ) on unit vectors — [[Search]] scaladoc;
  * reference: radient's GKMeans euclidean/cosine/lp metrics,
  * _gkmeans.py:125-133, and the Milvus sink metric_type,
  * milvus.py:122). Recall is measured against the EXACT cosine top-k. */
class CosineMetricSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val K = 10
  private val NQ = 100

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()

  private lazy val queries = emb.filter(col("vec_id") < NQ)
    .select(col("vec_id").as("qid"), col("embedding").as("qv")).cache()

  /** exact COSINE top-K neighbour ids per query (ties → lower id). */
  private lazy val exactCos: Map[Long, Set[Long]] = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (lit(1.0) - VectorF.cosine(col("embedding"), col("qv"))).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recall(found: DataFrame): Double = {
    val got = found.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exactCos.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    per.sum / per.size
  }

  test("IVF cosine: probing all clusters == exact cosine ranking") {
    val m = IvfIndex.build(emb, "vec_id", "embedding", k = 8,
      metric = "cosine")
    assert(m.metric === "cosine")
    val r = recall(m.search(queries, "qid", "qv", K, nprobe = 8))
    info(f"IVF cosine nprobe=all recall@$K = $r%.3f")
    assert(r >= 0.999)
  }

  // floor 0.6 at the deep-probe-knob setting nprobe=3 of 8 (measured
  // 0.625 population recall over the de-noised 100-query batch; the
  // 0.8-tier serving floors live in RecallReport at the entry configs)
  test("IVF-PQ cosine recall@10 beats 0.6 with rerank") {
    val m = IvfPq.build(emb, "vec_id", "embedding", kCoarse = 8, m = 16,
      ksub = 16, metric = "cosine")
    val r = recall(m.searchRerank(queries, "qid", "qv", K, nprobe = 3,
      shortlist = 50, vectors = emb, vecCol = "embedding"))
    info(f"IVF-PQ cosine recall@$K = $r%.3f")
    assert(r >= 0.6)
  }

  test("BQ cosine recall@10 beats 0.7 with rerank") {
    val m = BqIndex.build(emb, "vec_id", "embedding", metric = "cosine")
    val r = recall(m.searchRerank(queries, "qid", "qv", K, shortlist = 100,
      vectors = emb, vecCol = "embedding"))
    info(f"BQ cosine recall@$K = $r%.3f")
    assert(r >= 0.7)
  }

  test("GANN cosine recall@10 beats 0.5 at spill=0.15") {
    val m = GannIndex.build(emb, "vec_id", "embedding", leafSize = 64,
      spill = 0.15, metric = "cosine")
    val r = recall(m.search(queries, "qid", "qv", K))
    info(f"GANN cosine recall@$K = $r%.3f")
    assert(r >= 0.5)
  }

  test("cosine metric survives save/load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cosmeta").toString
    val m = BqIndex.build(emb, "vec_id", "embedding", metric = "cosine")
    BqIndex.save(m, dir)
    val loaded = BqIndex.load(spark, dir, "vec_id")
    assert(loaded.metric === "cosine")
    val a = m.search(queries, "qid", "qv", K).collect().map(_.toString).sorted
    val b = loaded.search(queries, "qid", "qv", K).collect().map(_.toString).sorted
    assert(a === b)
  }

  test("pre-metric saved layout (no meta dir) loads as l2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_l2meta").toString
    val m = BqIndex.build(emb, "vec_id", "embedding")
    BqIndex.save(m, dir)
    // simulate a round-6 index: drop the meta table
    val meta = new java.io.File(s"$dir/meta")
    meta.listFiles().foreach(_.delete()); meta.delete()
    assert(BqIndex.load(spark, dir, "vec_id").metric === "l2")
  }

  test("unknown metric is rejected at build") {
    intercept[IllegalArgumentException] {
      IvfIndex.build(emb, "vec_id", "embedding", metric = "dotproduct")
    }
  }
}
