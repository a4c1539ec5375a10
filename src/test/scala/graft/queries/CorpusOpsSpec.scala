package graft.queries

import graft.TestSpark
import graft.core.Tables
import graft.functions.TextF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-maintenance entries beyond the cell-exact
  * oracle: the CMS candidate pass is a SUPERSET of the true heavy
  * hitters (the property that makes the sketched plan hash-identical to
  * brute force), and the snapshot-delta classification matches its
  * membership arithmetic.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def bruteForce() = {
    val grams = Tables(spark, sf, "documents")
      .withColumn("t", TextF.tokens(col("text")))
      .select(explode(TextF.shingles(col("t"), 3)).as("gram"))
    val thresh = 5L
    (grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thresh)
      .orderBy(desc("cnt"), col("gram"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, thresh)
  }

  test("q_heavy_hitters equals the brute-force groupBy, exact counts included") {
    val (expected, _) = bruteForce()
    val got = CorpusOps.q_heavy_hitters.run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain at least one heavy hitter")
  }

  test("CMS estimates never undercount (the superset guarantee)") {
    val exact = Tables(spark, sf, "documents")
      .withColumn("t", TextF.tokens(col("text")))
      .select(explode(TextF.shingles(col("t"), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val skBytes = Tables(spark, sf, "documents")
      .withColumn("t", TextF.tokens(col("text")))
      .select(explode(TextF.shingles(col("t"), 3)).as("gram"))
      .select(count_min_sketch(col("gram").cast("binary"),
        lit(0.0001d), lit(0.99d), lit(42)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = CorpusOps.sketchFor(skBytes)
    exact.foreach { case (g, c) =>
      val est = cms.estimateCount(
        g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(est >= c, s"gram '$g': estimate $est < exact $c")
    }
  }

  test("q_corpus_delta classifies by the membership arithmetic") {
    import spark.implicits._
    val rows = CorpusOps.q_corpus_delta.run(spark, sf)
      .as[(Long, String)].collect().toMap
    val ids = Tables(spark, sf, "documents")
      .select(col("doc_id")).as[Long].collect().toSet
    ids.foreach { id =>
      if (id % 7 == 1) assert(rows.get(id).contains("added"), s"doc $id")
      else if (id % 7 == 2) assert(rows.get(id).contains("changed"), s"doc $id")
      else assert(!rows.contains(id), s"doc $id should be unchanged")
      if (id % 13 == 0)
        assert(rows.get(-id - 1L).contains("removed"), s"doc $id")
    }
    // every output row is accounted for by one of the three rules
    assert(rows.size ==
      ids.count(_ % 7 == 1) + ids.count(_ % 7 == 2) + ids.count(_ % 13 == 0))
  }
}
