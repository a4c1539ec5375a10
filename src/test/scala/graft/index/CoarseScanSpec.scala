package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** The short-circuited coarse-quantizer scans ([[Coarse]]) must return
  * EXACTLY what the naive full-sort scan returns, including
  * (distance, centroidId) tie-breaking — they replace it in the IVF /
  * IVF-PQ / IVF-BQ assign and probe loops. */
class CoarseScanSpec extends AnyFunSuite {

  private def naiveK(v: Array[Double], cents: Array[(Int, Array[Double])],
      np: Int): Seq[Int] =
    cents.zipWithIndex.map { case ((cid, c), pos) =>
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
      (pos, cid, s)
    }.sortBy { case (_, cid, d) => (d, cid) }.take(np).map(_._1).toSeq

  private def mkCents(rnd: scala.util.Random, k: Int, dim: Int,
      quantized: Boolean): Array[(Int, Array[Double])] =
    Array.tabulate(k) { cid =>
      (cid, Array.fill(dim)(
        if (quantized) rnd.nextInt(3).toDouble else rnd.nextDouble()))
    }

  test("nearestK == full sort over random vectors (ties included)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val dim = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(20)
      // quantized coordinates force frequent exact distance ties, so the
      // (d, cid) tie order is actually exercised
      val quantized = trial % 2 == 0
      val cents = mkCents(rnd, k, dim, quantized)
      val v = Array.fill(dim)(
        if (quantized) rnd.nextInt(3).toDouble else rnd.nextDouble())
      val np = 1 + rnd.nextInt(k + 2) // may exceed k
      assert(Coarse.nearestK(v, cents, np).toSeq === naiveK(v, cents, np),
        s"trial=$trial dim=$dim k=$k np=$np quantized=$quantized")
      assert(Coarse.nearest1(v, cents) === naiveK(v, cents, 1).head,
        s"nearest1 trial=$trial")
    }
  }

  test("nearestK handles np <= 0 and empty window edges") {
    val cents = Array((0, Array(0.0)), (1, Array(1.0)))
    assert(Coarse.nearestK(Array(0.4), cents, 0).isEmpty)
    assert(Coarse.nearestK(Array(0.4), cents, 5).toSeq === Seq(0, 1))
  }

  test("micro-bench at kCoarse=256: identical results, partial select faster") {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val cents = mkCents(rnd, 256, dim, quantized = false)
    val vs = Array.fill(2000)(Array.fill(dim)(rnd.nextDouble()))
    // equality over the whole batch
    vs.take(100).foreach { v =>
      assert(Coarse.nearestK(v, cents, 8).toSeq === naiveK(v, cents, 8))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    // warm both paths, then measure
    vs.take(200).foreach { v => Coarse.nearestK(v, cents, 8); naiveK(v, cents, 8) }
    val tFast = time(vs.foreach(Coarse.nearestK(_, cents, 8)))
    val tNaive = time(vs.foreach(naiveK(_, cents, 8)))
    info(f"kCoarse=256 nprobe=8 over ${vs.length} vectors: " +
      f"partial-select $tFast%.1f ms vs full-sort $tNaive%.1f ms")
    // informational only — a shared CI box is too noisy for a hard
    // latency assert; correctness (equality) is the pinned property
  }
}
