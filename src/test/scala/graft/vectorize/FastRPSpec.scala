package graft.vectorize

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** FastRP correctness vs a local dense implementation of the exact same
  * formula (R from the same seeded hash, N_1 = A·L·R, out = Σ w_k·N_k). */
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
    val lr = nodes.map(nd => rRow(nd).map(_ * (0.5 * math.pow(deg(idx(nd)), 0.0) / n)))
    def matmul(x: Seq[Array[Double]]): Seq[Array[Double]] =
      nodes.indices.map { i =>
        val out = new Array[Double](dim)
        nodes.indices.foreach { j =>
          if (a(i)(j) != 0.0) (0 until dim).foreach(k => out(k) += a(i)(j) * x(j)(k))
        }
        out
      }
    var nk = matmul(lr)
    val result = nk.map(_.map(_ * weights.head))
    weights.tail.foreach { w =>
      nk = matmul(nk)
      nodes.indices.foreach(i => (0 until dim).foreach(k => result(i)(k) += w * nk(i)(k)))
    }
    nodes.map(nd => nd -> result(idx(nd))).toMap
  }

  test("distributed FastRP matches the local dense oracle") {
    import spark.implicits._
    val edgeDf = edges.toDF("src", "dst", "weight")
    val got = FastRP.embed(edgeDf, dim, weights, beta = 0.0, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val want = localFastRP()
    assert(got.keySet == want.keySet)
    for ((node, w) <- want; k <- 0 until dim)
      assert(math.abs(got(node)(k) - w(k)) < 1e-9,
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
