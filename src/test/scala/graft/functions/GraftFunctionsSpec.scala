package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface: the registered functions must be callable from
  * `spark.sql` and agree exactly with their DataFrame twins. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("vector kernels callable from SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_l2_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l2,
        |       round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c,
        |       graft_hamming(CAST(5 AS BIGINT), CAST(6 AS BIGINT)) AS h
        |""".stripMargin).head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getInt(3) == 2) // 101 xor 110 = 011
  }

  test("text kernels agree with the DataFrame twins") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("Spark Native engine spark").toDF("text")
    val viaSql = spark.sql(
      "SELECT graft_simhash60(graft_tokens('Spark Native engine spark'))").head.getLong(0)
    val viaDf = df.select(TextF.simhash60(TextF.tokens(col("text")))).head.getLong(0)
    assert(viaSql == viaDf)
    val h = spark.sql("SELECT graft_h60('abc'), graft_h32('abc')").head
    assert(h.getLong(0) >= 0 && h.getLong(0) < (1L << 60))
    assert(h.getLong(1) == (h.getLong(0) >> 28)) // same md5 prefix
  }

  test("arity is validated at resolution") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0D))").head
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("extensions class injects the same registry") {
    // construction-time route: the class must be instantiable via the
    // spark.sql.extensions reflective path and apply cleanly
    val ext = Class.forName("graft.functions.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    val target = new org.apache.spark.sql.SparkSessionExtensions
    ext(target) // throws if any descriptor is malformed
  }
}
