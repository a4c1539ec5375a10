package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ/ADC is approximate — recall vs the exact path, plus determinism
  * and persistence invariants (SURVEY.md §7.4 testing stance). */
class PqRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val K = 10
  private val NQ = 20

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

  test("PQ/ADC recall@10 beats 0.3 at m=16, ksub=16 (ADC only)") {
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 16, ksub = 16)
    val r = recall(model.search(queries, "qid", "qv", K))
    info(f"PQ ADC-only recall@$K = $r%.3f")
    assert(r >= 0.3)
  }

  test("PQ shortlist + exact rerank recall@10 beats 0.8") {
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 16, ksub = 16)
    val r = recall(model.searchRerank(queries, "qid", "qv", K,
      shortlist = 50, vectors = emb, vecCol = "embedding"))
    info(f"PQ rerank(50) recall@$K = $r%.3f")
    assert(r >= 0.8)
  }

  test("PQ recall rises with finer codebooks (m=16 >= m=4)") {
    val coarse = PqIndex.build(emb, "vec_id", "embedding", m = 4, ksub = 16)
    val fine = PqIndex.build(emb, "vec_id", "embedding", m = 16, ksub = 16)
    val rc = recall(coarse.search(queries, "qid", "qv", K))
    val rf = recall(fine.search(queries, "qid", "qv", K))
    info(f"PQ recall@$K m=4 $rc%.3f -> m=16 $rf%.3f")
    assert(rf >= rc)
  }

  test("PQ codes are m small ints — the 32x compression invariant") {
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val rows = model.codes.select(
      size(col("codes")).as("m"),
      array_max(col("codes")).as("mx"),
      array_min(col("codes")).as("mn")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(0) == 8)
      assert(r.getInt(1) < 16 && r.getInt(2) >= 0)
    }
  }

  test("PQ build is deterministic: same seed, same codes") {
    val a = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val b = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val ca = a.codes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq
    val cb = b.codes.orderBy("vec_id").collect().map(_.getSeq[Int](1)).toSeq
    assert(ca == cb)
  }

  test("PQ and IVF-PQ over 20k synthetic vectors stay one-pass") {
    val n = 20000
    val dim = 16
    val big = spark.range(n).select(col("id").as("vec_id"),
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(lit(0), lit(dim - 1)),
        k => pow(sin(col("id") * 131 + k * 17), 3)).as("embedding"))
    val pq = PqIndex.build(big, "vec_id", "embedding", m = 4, ksub = 16)
    assert(pq.codes.count() == n)
    val qs = big.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    assert(pq.search(qs, "qid", "qv", 10).count() == 50)
    val ivfpq = IvfPq.build(big, "vec_id", "embedding",
      kCoarse = 16, m = 4, ksub = 16)
    assert(ivfpq.codes.count() == n)
    assert(ivfpq.search(qs, "qid", "qv", 10, nprobe = 4).count() == 50)
  }

  test("PQ save/load roundtrip preserves search results") {
    val model = PqIndex.build(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    PqIndex.save(model, dir)
    val loaded = PqIndex.load(spark, dir, "vec_id")
    assert(loaded.m == model.m && loaded.ksub == model.ksub && loaded.dsub == model.dsub)
    val a = model.search(queries, "qid", "qv", K)
      .select("qid", "vec_id", "rnk").collect().map(_.toSeq).toSet
    val b = loaded.search(queries, "qid", "qv", K)
      .select("qid", "vec_id", "rnk").collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
