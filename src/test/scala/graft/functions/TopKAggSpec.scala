package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** TopKAgg must agree row-for-row with the window-rank formulation it
  * replaces (same (dist, id) lexicographic order, including ties). */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(seed: Int, nq: Int, n: Int) = {
    val rnd = new Random(seed)
    for {
      q <- 0 until nq
      i <- 0 until n
    } yield (q.toLong, rnd.nextLong().abs % 1000,
      // coarse buckets force plenty of distance ties
      (rnd.nextInt(20) / 2).toDouble)
  }

  test("matches window row_number ranking including ties") {
    val K = 7
    val df = rows(11, 5, 300).toDF("qid", "id", "dist")
      .groupBy("qid", "id").agg(min("dist").as("dist")).cache()
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("id"))
    val expected = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("qid", "rnk", "id", "dist").collect()
      .map(_.toSeq).toSet
    val got = df.groupBy(col("qid"))
      .agg(TopKAgg.topK(col("dist"), col("id"), K).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).as("rnk"),
        col("s.id").as("id"), col("s.dist").as("dist")).collect()
      .map(_.toSeq).toSet
    assert(got == expected)
  }

  test("fewer rows than k returns all, ordered") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 1.0), (1L, 12L, 2.0)).toDF("qid", "id", "dist")
    val got = df.groupBy(col("qid"))
      .agg(TopKAgg.topK(col("dist"), col("id"), 10).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L, 12L, 10L))
  }

  test("k = 0 returns empty array") {
    val df = Seq((1L, 10L, 3.0)).toDF("qid", "id", "dist")
    val got = df.groupBy(col("qid"))
      .agg(TopKAgg.topK(col("dist"), col("id"), 0).as("top"))
      .select(size(col("top"))).head().getInt(0)
    assert(got == 0)
  }
}
