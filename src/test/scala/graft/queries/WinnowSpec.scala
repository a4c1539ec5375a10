package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee (Schleimer-Wilkerson-Aiken): with shingle
  * size n=3 and window w=4, any shared token run of length ≥ n+w+1
  * contains at least w consecutive shared shingles — one full window —
  * so the two documents select at least one common fingerprint from it.
  * Pinned constructively here; the engine-vs-DuckDB agreement is the
  * oracle entry (q_doc_winnow). */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fingerprints(rows: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextF._
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, 3)
    rows.toDF("doc_id", "text")
      .withColumn("g", shingles(tokens(col("text")), 3))
      .select(col("doc_id"), size(col("g")).as("n"),
        posexplode(col("g")).as(Seq("pos0", "sh")))
      .select(col("doc_id"), col("n"), (col("pos0") + 1).as("pos"),
        h32(col("sh")).as("hv"))
      .withColumn("fp", min(col("hv")).over(w))
      .filter(col("pos") <= col("n") - 3)
      .select("doc_id", "fp").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  test("documents sharing a >= 8-token run share a fingerprint; " +
      "disjoint documents don't") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val fps = fingerprints(Seq(
      1L -> s"one two three $shared x y z",
      2L -> s"p q r s $shared uu vv",
      3L -> "completely different words with no overlap at all here"))
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "a shared 8-token run must select at least one common fingerprint")
    assert(fps(1L).intersect(fps(3L)).isEmpty &&
      fps(2L).intersect(fps(3L)).isEmpty,
      "disjoint shingle sets cannot share fingerprints")
  }

  test("short documents (< window shingles) emit no fingerprints") {
    val fps = fingerprints(Seq(4L -> "just five little words here",
      5L -> "a b"))
    // 5 tokens -> 3 shingles < w=4 -> pos <= n-3 = 0 rows; 2 tokens -> 0 shingles
    assert(!fps.contains(4L) && !fps.contains(5L))
  }
}
