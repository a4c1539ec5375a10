package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs at sf0.001; oracle-bearing queries
  * return rows (the hash-level check is scripts/check_oracle.py / the
  * driver's DuckDB gate). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // queries whose correct sf0.001 result may legitimately be empty
  private val mayBeEmpty = Set("q_dedup_ngram_jaccard", "q_dedup_minhash_lsh")

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, TestSpark.sf0001)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
