package graft.queries

import graft.TestSpark
import graft.functions.TextF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the global span scrub (q_dedup_scrub_spans) on hand-built
  * fixtures — the keeper/coverage arithmetic the sf-level oracle can't
  * pin document-by-document: the lowest-doc_id copy keeps its span, every
  * other copy loses exactly the covered positions, unique docs pass
  * through byte-identical, and a doc whose every position is covered
  * scrubs down to the empty string.
  */
class ScrubSpansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scrubspans").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def h60(s: String): Long =
    spark.range(1).select(TextF.h60(lit(s))).head().getLong(0)

  private def run(dir: String): Map[Long, (Long, Long, Long)] =
    Dedup.q_dedup_scrub_spans.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("keeper keeps its span, non-keeper loses exactly the covered " +
      "positions, unique doc passes through") {
    val dir = fixture(Seq(
      (0L, "a b c d e x"),
      (1L, "z a b c d e y"),
      (2L, "p q r s t u")))
    val got = run(dir)
    // "a b c d e" occurs in docs 0 and 1 → keeper 0; doc 1 drops
    // positions 1..5 and keeps [z, y]; every other gram is unique
    assert(got(0L) == ((6L, 0L, h60("a b c d e x"))))
    assert(got(1L) == ((7L, 5L, h60("z y"))))
    assert(got(2L) == ((6L, 0L, h60("p q r s t u"))))
  }

  test("doc covered end to end scrubs to the empty string; sub-5-token " +
      "docs are never scrubbed") {
    val dir = fixture(Seq(
      (10L, "a b c d e f"),
      (11L, "b c d e f a b c d e"),
      (12L, "a b c d")))
    val got = run(dir)
    // doc 11 shares "a b c d e" (pos 5) and "b c d e f" (pos 0) with
    // keeper doc 10 → positions 0..4 ∪ 5..9 = everything
    assert(got(10L) == ((6L, 0L, h60("a b c d e f"))))
    assert(got(11L) == ((10L, 10L, h60(""))))
    // doc 12 has < 5 tokens → no grams → untouched
    assert(got(12L) == ((4L, 0L, h60("a b c d"))))
  }
}
