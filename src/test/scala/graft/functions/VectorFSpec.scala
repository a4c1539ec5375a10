package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import VectorF._

  private def one(colExpr: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f, 2.0f), Seq(3.0f, 0.0f, 4.0f)))
      .toDF("a", "b").select(colExpr).head.get(0)
  }

  test("dot product closed form") { assert(one(dot(col("a"), col("b"))) == 11.0) }
  test("l2 norm closed form") { assert(one(l2Norm(col("a"))) == 3.0) }
  test("l2 dist closed form") {
    // (1-3,2-0,2-4) -> 4+4+4 = 12
    assert(one(l2Dist(col("a"), col("b"))) == math.sqrt(12.0))
  }
  test("cosine closed form") {
    assert(one(cosine(col("a"), col("b"))).asInstanceOf[Double] === 11.0 / (3.0 * 5.0))
  }
  test("normalize gives unit norm") {
    val n = one(l2Norm(normalize(col("a")))).asInstanceOf[Double]
    assert(math.abs(n - 1.0) < 1e-12)
  }
  test("normalize of zero vector is zeros") {
    import spark.implicits._
    val r = Seq(Seq(0.0f, 0.0f)).toDF("a")
      .select(normalize(col("a"))).head.getSeq[Double](0)
    assert(r == Seq(0.0, 0.0))
  }
  test("jaccard on boolean fingerprints") {
    import spark.implicits._
    val r = Seq((Seq(true, true, false, true), Seq(true, false, true, true)))
      .toDF("a", "b").select(jaccardSimBool(col("a"), col("b"))).head.getDouble(0)
    assert(r == 2.0 / 4.0)
  }
  test("jaccard on packed longs matches boolean path") {
    import spark.implicits._
    // bits 0,1,3 vs bits 0,2,3 -> inter 2, union 4
    val r = Seq((Seq(0x0bL), Seq(0x0dL))).toDF("a", "b")
      .select(jaccardSimPacked(col("a"), col("b"))).head.getDouble(0)
    assert(r == 2.0 / 4.0)
  }
  test("hamming distance") {
    import spark.implicits._
    val r = Seq((0x0fL, 0x09L)).toDF("a", "b")
      .select(hammingDist(col("a"), col("b"))).head.getInt(0)
    assert(r == 2)
  }
}
