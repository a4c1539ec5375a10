package graft.vectorize

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** FastRP correctness vs a local dense implementation of the exact same
  * formula (R from the same seeded hash, N_1 = A·L·R, out = Σ w_k·N_k),
  * INCLUDING the integer-micros quantization (round 10): the dense
  * oracle rounds the init row, every per-edge contribution, and every
  * weighted term to whole micros exactly like the distributed path, so
  * the comparison is EXACT equality, not a tolerance — any partition-
  * order sensitivity or rounding divergence fails outright. */
class FastRPSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 4
  private val seed = 42L
  private val weights = Seq(0.1, 0.2, 1.0, 3.0)
  // small directed weighted graph, node ids 0..4
  private val edges: Seq[(Long, Long, Double)] = Seq(
    (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0), (0L, 2L, 2.0),
    (3L, 0L, 1.0), (2L, 3L, 0.5), (4L, 2L, 1.0))

  private def h32Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  // Spark's Round(double) goes through BigDecimal.valueOf (shortest
  // decimal repr) + HALF_UP — replicate exactly
  private def rnd0(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def localFastRP(): Map[Long, Array[Double]] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val idx = nodes.zipWithIndex.toMap
    val a = Array.fill(n, n)(0.0)
    edges.foreach { case (s, d, w) => a(idx(s))(idx(d)) += w }
    val density = 1.0 / math.sqrt(dim)
    val scale = math.sqrt(1.0 / density) / math.sqrt(dim)
    def rRow(node: Long): Array[Double] =
      (0 until dim).map { k =>
        val u = (h32Local(s"rp$seed#$node#$k") % 1000000L).toDouble / 1000000.0
        if (u < density / 2) scale else if (u < density) -scale else 0.0
      }.toArray
    val deg = nodes.map(nd => a(idx(nd)).sum)
    // init in integer micros, same op order as the distributed expression
    val lr = nodes.map(nd => rRow(nd).map(v =>
      rnd0(v * (0.5 * math.pow(deg(idx(nd)), 0.0) / n) * 1e6)))
    // per-edge contributions round to whole micros before summation
    def matmul(x: Seq[Array[Double]]): Seq[Array[Double]] =
      nodes.indices.map { i =>
        val out = new Array[Double](dim)
        nodes.indices.foreach { j =>
          if (a(i)(j) != 0.0)
            (0 until dim).foreach(k => out(k) += rnd0(x(j)(k) * a(i)(j)))
        }
        out
      }
    var nk = matmul(lr)
    val result = nk.map(_.map(v => rnd0(v * weights.head)))
    weights.tail.foreach { w =>
      nk = matmul(nk)
      nodes.indices.foreach(i =>
        (0 until dim).foreach(k => result(i)(k) += rnd0(nk(i)(k) * w)))
    }
    nodes.map(nd => nd -> result(idx(nd)).map(_ / 1e6)).toMap
  }

  test("distributed FastRP matches the quantized dense oracle EXACTLY") {
    import spark.implicits._
    val edgeDf = edges.toDF("src", "dst", "weight")
    val got = FastRP.embed(edgeDf, dim, weights, beta = 0.0, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val want = localFastRP()
    assert(got.keySet == want.keySet)
    for ((node, w) <- want; k <- 0 until dim)
      assert(got(node)(k) == w(k),
        s"node $node comp $k: got ${got(node)(k)} want ${w(k)}")
  }

  test("deterministic across runs") {
    import spark.implicits._
    val edgeDf = edges.toDF("src", "dst", "weight")
    val a = FastRP.embed(edgeDf, dim, weights).collect().sortBy(_.getLong(0)).mkString
    val b = FastRP.embed(edgeDf, dim, weights).collect().sortBy(_.getLong(0)).mkString
    assert(a == b)
  }
}
