package graft.dedup

import graft.TestSpark
import graft.functions.TextF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two candidate-generation strategies must return EXACTLY the same
  * qualifying pairs (prefix filtering is a lossless prune). */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val shingles = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .withColumn("toks", TextF.tokens(col("text")))
    .select(col("doc_id"), col("lang"),
      TextF.shingleSet(col("toks"), 3).as("sh"))
    .withColumn("nsh", size(col("sh")))
    .cache()

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

  test("prefixFiltered equals countJoin on the documents fixture") {
    for (tau <- Seq(0.5, 0.8)) {
      val cj = pairs(SetSimJoin.countJoin(shingles, "doc_id", "lang", "sh", "nsh", tau))
      val pf = pairs(SetSimJoin.prefixFiltered(shingles, "doc_id", "lang", "sh", "nsh", tau))
      assert(cj == pf, s"strategies diverge at tau=$tau")
      assert(cj.nonEmpty, s"fixture yields no pairs at tau=$tau — test is vacuous")
    }
  }

  test("skewed input: a hot shared element does not change results") {
    import spark.implicits._
    // every set shares the hot element "zz zz zz"; only 1&2 are near-dups
    val df = Seq(
      (1L, Seq("zz zz zz", "a b c", "b c d", "c d e")),
      (2L, Seq("zz zz zz", "a b c", "b c d", "c d e")),
      (3L, Seq("zz zz zz", "p q r", "q r s", "r s t")),
      (4L, Seq("zz zz zz", "u v w", "v w x", "w x y"))
    ).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    val cj = pairs(SetSimJoin.countJoin(df, "doc_id", "lang", "sh", "nsh", 0.9))
    val pf = pairs(SetSimJoin.prefixFiltered(df, "doc_id", "lang", "sh", "nsh", 0.9))
    assert(cj == pf)
    assert(cj.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }
}
