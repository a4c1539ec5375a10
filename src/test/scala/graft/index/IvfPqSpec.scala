package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ is approximate at two levels (coarse probe misses + code
  * distortion) — recall vs exact, monotone knobs, and persistence. */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val K = 10
  private val NQ = 100

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()

  private lazy val queries = emb.filter(col("vec_id") < NQ)
    .select(col("vec_id").as("qid"), col("embedding").as("qv")).cache()

  private lazy val exact: Map[Long, Set[Long]] = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorF.l2Dist(col("embedding"), col("qv")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recall(found: DataFrame): Double = {
    val got = found.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exact.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    per.sum / per.size
  }

  test("IVF-PQ rerank recall@10 beats 0.6 probing 3 of 8 clusters") {
    val model = IvfPq.build(emb, "vec_id", "embedding",
      kCoarse = 8, m = 16, ksub = 16)
    val r = recall(model.searchRerank(queries, "qid", "qv", K,
      nprobe = 3, shortlist = 50, vectors = emb, vecCol = "embedding"))
    info(f"IVF-PQ rerank recall@$K = $r%.3f")
    assert(r >= 0.6)
  }

  test("IVF-PQ recall rises with nprobe") {
    val model = IvfPq.build(emb, "vec_id", "embedding",
      kCoarse = 8, m = 16, ksub = 16)
    val r1 = recall(model.search(queries, "qid", "qv", K, nprobe = 1))
    val r8 = recall(model.search(queries, "qid", "qv", K, nprobe = 8))
    info(f"IVF-PQ ADC recall nprobe1=$r1%.3f nprobe8=$r8%.3f")
    assert(r8 >= r1)
  }

  test("residual PQ beats raw PQ at the same code budget (ADC-only)") {
    // the whole point of encoding residuals: they concentrate near zero,
    // so the same m x ksub budget spends its centroids on a tighter ball
    val ivfpq = IvfPq.build(emb, "vec_id", "embedding",
      kCoarse = 8, m = 16, ksub = 16)
    val rawpq = PqIndex.build(emb, "vec_id", "embedding", m = 16, ksub = 16)
    val rIvfPq = recall(ivfpq.search(queries, "qid", "qv", K, nprobe = 8))
    val rRaw = recall(rawpq.search(queries, "qid", "qv", K))
    info(f"ADC recall@$K residual=$rIvfPq%.3f raw=$rRaw%.3f")
    assert(rIvfPq >= rRaw)
  }

  test("codes cover every vector once, inside its IVF cluster") {
    val model = IvfPq.build(emb, "vec_id", "embedding",
      kCoarse = 8, m = 8, ksub = 16)
    assert(model.codes.count() == 500)
    assert(model.codes.select("vec_id").distinct().count() == 500)
    val perCluster = model.codes.groupBy("cluster").count().collect()
    assert(perCluster.map(_.getLong(1)).sum == 500)
    assert(perCluster.length <= 8)
  }

  test("IVF-PQ save/load roundtrip preserves search results") {
    val model = IvfPq.build(emb, "vec_id", "embedding",
      kCoarse = 8, m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPq.save(model, dir)
    val loaded = IvfPq.load(spark, dir, "vec_id")
    assert(loaded.m == model.m && loaded.ksub == model.ksub)
    val a = model.search(queries, "qid", "qv", K, nprobe = 3)
      .select("qid", "vec_id", "rnk").collect().map(_.toSeq).toSet
    val b = loaded.search(queries, "qid", "qv", K, nprobe = 3)
      .select("qid", "vec_id", "rnk").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
