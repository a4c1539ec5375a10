package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the per-source KL drift entry (q_source_kl) on hand-built
  * mixtures: identical-distribution sources score exactly 0, a skewed
  * source scores the hand-computed positive KL, and the score is
  * symmetric when the sources mirror each other.
  */
class SourceKlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sourcekl").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[String, (Long, Double)] =
    TextAnalysis.q_source_kl.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("identical source distributions score exactly 0") {
    val got = run(fixture(Seq(
      (0L, "x y", "crawlA"), (1L, "x y", "crawlB"))))
    assert(got("crawlA") == ((2L, 0.0)))
    assert(got("crawlB") == ((2L, 0.0)))
  }

  test("mirrored skew scores the hand-computed KL on both sides") {
    // A: {x:3, y:1}, B: {x:1, y:3}, corpus: {x:4, y:4}, n=8.
    // KL = (3·ln(3·8/(4·4)) + 1·ln(1·8/(4·4))) / 4
    //    = (3·round(ln 1.5, 6) + round(ln 0.5, 6)) micros / 1e6 / 4
    //    = (3·405465 − 693147) / 1e6 / 4 = 0.130812
    val got = run(fixture(Seq(
      (0L, "x x x y", "crawlA"), (1L, "x y y y", "crawlB"))))
    assert(got("crawlA") == ((4L, 0.130812)))
    assert(got("crawlB") == ((4L, 0.130812)))
  }
}
