package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The codegen'd vector expressions must match a plain Scala sequential
  * fold bit-for-bit (that equivalence is what lets them replace the HOF
  * forms under oracle-checked queries), for float and double arrays. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cases(seed: Int): Seq[(List[Double], List[Double])] = {
    val rnd = new Random(seed)
    (0 to 20).map { i =>
      val n = i * 3 // includes the empty array
      (List.fill(n)(rnd.nextDouble() * 2000 - 1000),
        List.fill(n)(rnd.nextDouble() * 2000 - 1000))
    }
  }

  private def refDot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }
  private def refL2(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      val d = a(i) - b(i); s += d * d; i += 1
    }
    math.sqrt(s)
  }

  test("DotProduct and L2Distance match the scalar fold on double arrays") {
    val df = cases(42).toDF("a", "b")
      .select(col("a"), col("b"),
        VectorF.dot(col("a"), col("b")).as("d"),
        VectorF.l2Dist(col("a"), col("b")).as("l"))
    df.collect().foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(r.getDouble(2) == refDot(a, b))
      assert(r.getDouble(3) == refL2(a, b))
    }
  }

  test("float arrays widen per element exactly like the cast") {
    val df = cases(7).map { case (a, b) =>
      (a.map(_.toFloat), b.map(_.toFloat))
    }.toDF("a", "b")
      .select(col("a"), col("b"),
        VectorF.dot(col("a"), col("b")).as("d"),
        VectorF.l2Dist(col("a"), col("b")).as("l"))
    df.collect().foreach { r =>
      val a = r.getSeq[Float](0).map(_.toDouble)
      val b = r.getSeq[Float](1).map(_.toDouble)
      assert(r.getDouble(2) == refDot(a, b))
      assert(r.getDouble(3) == refL2(a, b))
    }
  }

  test("mixed float/double operands work") {
    val row = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.25))).toDF("a", "b")
      .select(VectorF.dot(col("a"), col("b")).as("d")).head()
    assert(row.getDouble(0) == 1.0)
  }

  test("null ELEMENT poisons the result (HOF-fold parity)") {
    val row = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(Some(1.0), Some(2.0), Some(3.0))))
      .toDF("a", "b")
      .select(VectorF.dot(col("a"), col("b")).as("d"),
        VectorF.l2Dist(col("a"), col("b")).as("l")).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("null input yields null") {
    val row = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(VectorF.dot(col("a"), col("b")).as("d")).head()
    assert(row.isNullAt(0))
  }

  test("HammingWords matches the per-word popcount fold and null rules") {
    val rnd = new Random(7)
    val pairs = (0 to 10).map { i =>
      (List.fill(i)(rnd.nextLong()), List.fill(i)(rnd.nextLong()))
    }
    pairs.foreach { case (a, b) =>
      val want = a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
      val got = Seq((a, b)).toDF("a", "b")
        .select(VectorF.hammingWords(col("a"), col("b"))).head().getLong(0)
      assert(got == want)
    }
    // length mismatch → null; null word → null
    val mism = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(VectorF.hammingWords(col("a"), col("b"))).head()
    assert(mism.isNullAt(0))
    val nulled = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
      .select(VectorF.hammingWords(col("a"), col("b"))).head()
    assert(nulled.isNullAt(0))
    // SQL registration
    GraftFunctions.register(spark)
    Seq((Seq(3L), Seq(1L))).toDF("a", "b").createOrReplaceTempView("hw_t")
    assert(spark.sql("SELECT graft_hamming_words(a, b) FROM hw_t").head().getLong(0) == 1L)
  }

  test("interpreted path (no codegen) agrees with codegen") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val a = Seq(1.5, -2.25, 3.0); val b = Seq(0.5, 4.0, -1.0)
      val row = Seq((a, b)).toDF("a", "b")
        .select(VectorF.dot(col("a"), col("b")).as("d"),
          VectorF.l2Dist(col("a"), col("b")).as("l")).head()
      assert(row.getDouble(0) == refDot(a, b))
      assert(row.getDouble(1) == refL2(a, b))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
