package graft.dedup

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The all-pairs cosine dedup is demoted from query to RECALL ORACLE here:
  * q_dedup_embedding's plan now generates candidates through the LSH
  * bucket join (no cross join), and this spec pins the bucketed result
  * equal to the exact brute-force pair set on the fixture.
  */
class EmbeddingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val COSINE_T = 0.45

  private def brutePairs(dir: String): Set[(Long, Long)] = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        VectorF.l2Norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("nrm").as("nrma"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("nrm").as("nrmb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(VectorF.cosinePre(VectorF.dot(col("ea"), col("eb")),
        col("nrma"), col("nrmb")), 6) >= COSINE_T)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("LSH-bucketed q_dedup_embedding equals the exact all-pairs result") {
    val dir = TestSpark.sf0001
    val exact = brutePairs(dir)
    assert(exact.nonEmpty, "fixture has no near-dup pairs at the threshold")
    val bucketed = graft.queries.Dedup.q_dedup_embedding
      .run(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == exact,
      s"missed=${(exact -- bucketed).take(5)} extra=${(bucketed -- exact).take(5)}")
  }

  test("candidate radius bounds the cosine threshold with slack") {
    val r = graft.queries.Dedup.cosineRadius(COSINE_T)
    assert(r > math.sqrt(2.0 - 2.0 * COSINE_T))
    assert(r < math.sqrt(2.0 - 2.0 * COSINE_T) + 0.1)
  }

  test("q_dedup_embedding physical plan contains no cartesian product") {
    val plan = graft.queries.Dedup.q_dedup_embedding
      .run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate generation must not fall back to a cross join")
  }
}
