package graft.vectorize

import graft.TestSpark
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet").cache()

  test("tfidf vectors are unit-normalized sparse vectors") {
    val model = TfIdf.fit(docs)
    val sample = TfIdf.embed(model, docs.limit(20))
      .select("tfidf").collect().map(_.getAs[SparseVector](0))
    sample.foreach { v =>
      val n = math.sqrt(v.values.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
      assert(v.indices.nonEmpty)
    }
  }

  test("self-query returns the source document first with score ~1") {
    val model = TfIdf.fit(docs)
    val q = docs.filter(col("doc_id") === 7).select("text").head.getString(0)
    val top = TfIdf.topK(model, docs, "text", q, 3).collect()
    assert(top.head.getLong(0) == 7L)
    assert(math.abs(top.head.getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("sparse dot merges index lists correctly") {
    val a = new SparseVector(8, Array(1, 3, 5), Array(1.0, 2.0, 3.0))
    val b = new SparseVector(8, Array(3, 5, 7), Array(4.0, 5.0, 6.0))
    assert(TfIdf.sparseDot(a, b) == 2.0 * 4.0 + 3.0 * 5.0)
  }
}
