package graft

import graft.core.Caches
import org.scalatest.funsuite.AnyFunSuite

/** Cache lifecycle: every engine-pinned cache is tracked and released by
  * Caches.clear, eviction hooks fire, and the queries stay correct after
  * a clear (caches are a performance boundary, never a correctness one).
  */
class CachesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def cachedPlans: Int = {
    // storage-registered RDDs: cached DataFrames materialize here once
    // an action touched them
    spark.sparkContext.getPersistentRDDs.size
  }

  test("clear releases the dedup family's tracked caches") {
    Caches.clear(spark) // start from a clean slate
    spark.catalog.clearCache()
    val before = cachedPlans
    val r1 = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir).collect()
    assert(cachedPlans > before, "dedup run should pin shingle/signature caches")
    Caches.clear(spark)
    // <=, not ==: non-blocking unpersists from PRIOR suites (PageRank /
    // compaction checkpoint releases) may drain between the two
    // measurements, legitimately dropping the count below `before`
    assert(cachedPlans <= before, "clear must release every tracked cache")
    // correctness unaffected: the same query recomputes identically
    val r2 = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir).collect()
    assert(r1.toSeq == r2.toSeq)
    Caches.clear(spark)
  }

  test("clear evicts memoized index models via onClear hooks") {
    Caches.clear(spark)
    var evicted = false
    Caches.onClear(spark) { evicted = true }
    // ANN entry memoizes its index model and registers eviction
    val rows1 = SparkEntry.queries("q_ann_gann")(spark, dir).collect()
    assert(rows1.nonEmpty)
    Caches.clear(spark)
    assert(evicted, "onClear hook must run")
    // post-eviction the model rebuilds (fresh memo entry) and still answers
    val rows2 = SparkEntry.queries("q_ann_gann")(spark, dir).collect()
    assert(rows2.toSeq == rows1.toSeq,
      "deterministic rebuild: same seeds, same answer")
    Caches.clear(spark)
  }

  test("hooks run once and are dropped") {
    var n = 0
    Caches.onClear(spark) { n += 1 }
    Caches.clear(spark)
    Caches.clear(spark)
    assert(n == 1)
  }
}
