package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass stats kernel must be VALUE-IDENTICAL to the
  * declarative HOF chain it replaced inside quality_filter — asserted
  * corpus-wide on the fixture and on hand-picked whitespace/unicode
  * edge cases (the trim-vs-split boundary disagreements all land on
  * empty tokens, which both paths drop).
  */
class TextQualityStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def declarative(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("_t", TextF.tokens(col("text")))
    .withColumn("_g", TextF.shingles(col("_t"), 3))
    .select(col("text"),
      size(col("_t")).as("nt"),
      TextF.hitCount(col("_t"), TextF.stopwords).as("sw"),
      size(col("_g")).as("n3"),
      size(array_distinct(col("_g"))).as("nd"))

  private def kernel(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("_q", TextQualityStats.stats(col("text")))
    .select(col("text"), col("_q.nt").as("nt"), col("_q.sw").as("sw"),
      col("_q.n3").as("n3"), col("_q.nd").as("nd"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("equals the declarative chain on the whole fixture corpus") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet").select("text")
    assert(rows(kernel(docs)) == rows(declarative(docs)))
  }

  test("edge cases: empty, all-whitespace, short, repeated, tabs, unicode") {
    import spark.implicits._
    val edge = Seq("", "   ", "\t\n ", "a", "a b", "a b c",
      "a  b\tc   d", "x y z x y z x y z", "The THE the tHe",
      "café touché café touché café",
      "a b c a b c", " leading and trailing  ").toDF("text")
    assert(rows(kernel(edge)) == rows(declarative(edge)))
  }

  test("keep verdict equals the struct-form thresholds on the corpus + edges") {
    import spark.implicits._
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet").select("text")
      .union(Seq("", "   ", "a b", "a b c d e", "the the the the the",
        "x y z q w e r t").toDF("text"))
    val viaKeep = docs
      .filter(TextQualityStats.keeps(col("text"), 5, 1000, 50, 200))
      .collect().map(_.getString(0)).sorted.toSeq
    val viaStruct = kernel(docs)
      .filter(col("nt") >= 5 && col("nt") <= 1000 &&
        col("sw") * 1000 >= col("nt") * 50 &&
        (col("n3") - col("nd")) * 1000 <= col("n3") * 200)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaKeep == viaStruct && viaKeep.nonEmpty)
  }

  test("null text yields a null struct, matching the chain") {
    import spark.implicits._
    val df = Seq(Some("a b c"), None).toDF("text")
    val k = df.withColumn("_q", TextQualityStats.stats(col("text")))
      .select(col("_q")).collect()
    assert(k.count(_.isNullAt(0)) == 1)
  }

  test("whole-stage codegen keeps the kernel inline (no fallback)") {
    val docs = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet").select("text")
    // the *(n) stage marker on the Project carrying the kernel is the
    // plan-string form of "inside WholeStageCodegen"
    val plan = kernel(docs).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("text_quality_stats") && l.trim.matches("^[+:-]*\\s*\\*\\(\\d+\\).*")), plan)
  }
}
