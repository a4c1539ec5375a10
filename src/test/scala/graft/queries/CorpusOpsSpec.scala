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

  test("frequentGrams equals brute force on random corpora (generative)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "gg")
    for (trial <- 1 to 4) {
      val docs = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val minCount = 2L + rnd.nextInt(3)
      val got = CorpusOps.frequentGrams(docs, "text", n = 3, minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val brute = docs
        .select(explode(TextF.shingles(TextF.tokens(col("text")), 3)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(desc("c"), col("g"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(got == brute, s"trial $trial minCount $minCount")
    }
  }

  test("snapshotDelta matches a reference classifier on random mutations (generative)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9393)
    for (trial <- 1 to 4) {
      val curM = (0 until 30).map(i =>
        i.toLong -> s"text-${rnd.nextInt(5)}-$i").toMap
      // previous snapshot: drop some, mutate some, add some extinct ids
      val prevM = curM.flatMap { case (id, t) =>
        rnd.nextInt(4) match {
          case 0 => None // added since
          case 1 => Some(id -> (t + "-old")) // changed
          case _ => Some(id -> t) // unchanged
        }
      } ++ (100L until 100L + rnd.nextInt(5)).map(id => id -> s"gone-$id")
      val out = CorpusOps.snapshotDelta(
          curM.toSeq.toDF("doc_id", "text"),
          prevM.toSeq.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = (curM.keySet ++ prevM.keySet).flatMap { id =>
        (curM.get(id), prevM.get(id)) match {
          case (Some(_), None) => Some(id -> "added")
          case (None, Some(_)) => Some(id -> "removed")
          case (Some(a), Some(b)) if a != b => Some(id -> "changed")
          case _ => None
        }
      }.toMap
      assert(out == expected, s"trial $trial")
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
