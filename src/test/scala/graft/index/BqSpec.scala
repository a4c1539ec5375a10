package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-quantization index: recall with exact rerank, roundtrip,
  * frozen-threshold insert, and shortlist monotonicity. */
class BqSpec extends AnyFunSuite {
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

  private lazy val model = BqIndex.build(emb, "vec_id", "embedding")

  test("1-bit sketch + exact rerank keeps a recall floor; wider shortlist helps") {
    val r50 = recall(model.searchRerank(queries, "qid", "qv", K,
      shortlist = 50, vectors = emb, vecCol = "embedding"))
    val r150 = recall(model.searchRerank(queries, "qid", "qv", K,
      shortlist = 150, vectors = emb, vecCol = "embedding"))
    info(f"BQ recall@$K shortlist=50: $r50%.3f, shortlist=150: $r150%.3f")
    assert(r50 >= 0.5)
    assert(r150 >= r50)
  }

  test("save/load roundtrip serves identical results") {
    val path = java.nio.file.Files.createTempDirectory("graft_bq").toString
    BqIndex.save(model, path)
    val loaded = BqIndex.load(spark, path, "vec_id")
    assert(loaded.thresholds.toSeq == model.thresholds.toSeq)
    val a = model.searchRerank(queries, "qid", "qv", K, 50, emb, "embedding")
      .collect().map(_.toSeq).toSet
    val b = loaded.searchRerank(queries, "qid", "qv", K, 50, emb, "embedding")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("insert encodes against frozen thresholds and serves new rows") {
    val base = emb.filter(col("vec_id") >= 100)
    val extra = emb.filter(col("vec_id") < 100)
    val m0 = BqIndex.build(base, "vec_id", "embedding")
    val m1 = BqIndex.insert(m0, extra, "embedding")
    assert(m1.appends == 1)
    assert(m1.codes.count() == 500)
    // old rows' codes untouched (thresholds frozen)
    val before = m0.codes.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val after = m1.codes.filter(col("vec_id") >= 100).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(before == after)
    // an inserted vector's own embedding finds it through the rerank
    val probe = extra.filter(col("vec_id") === 7)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m1.searchRerank(probe, "qid", "qv", k = 1,
      shortlist = 50, vectors = emb, vecCol = "embedding").collect()
    assert(top.length == 1 && top(0).getLong(1) == 7L)
  }
}
