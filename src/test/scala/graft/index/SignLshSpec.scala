package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall + pruning properties of the sign-LSH candidate generator behind
  * q_dedup_embedding_tight: the fixed-seed banded join must recover the
  * exact all-pairs result on the planted-twin corpus (recall oracle), and
  * must actually PRUNE — the candidate set a production near-dup
  * threshold exists to keep bucket-local (see SCALE.md) has to be a small
  * fraction of all pairs, else the generator is q_dedup_embedding's
  * degenerate all-pairs join all over again.
  */
class SignLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val TIGHT_T = 0.9

  /** The entry's planted-twin corpus: base ∪ (vec_id+1e6, dims i%8 ==
    * vec_id%8 zeroed) — same construction as the query and its oracle. */
  private def corpus(dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val twin = base.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("e"), (x, i) =>
        when(pmod(i, lit(8)) === pmod(col("vec_id"), lit(8)), lit(0.0))
          .otherwise(x)).as("e"))
    base.unionByName(twin).withColumn("nrm", VectorF.l2Norm(col("e")))
  }

  private def brutePairs(c: DataFrame): Set[(Long, Long)] = {
    val a = c.select(col("vec_id").as("vec_a"), col("e").as("ea"),
      col("nrm").as("nrma"))
    val b = c.select(col("vec_id").as("vec_b"), col("e").as("eb"),
      col("nrm").as("nrmb"))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .filter(round(VectorF.cosinePre(VectorF.dot(col("ea"), col("eb")),
        col("nrma"), col("nrmb")), 6) >= TIGHT_T)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q_dedup_embedding_tight equals the exact all-pairs result") {
    val dir = TestSpark.sf0001
    val exact = brutePairs(corpus(dir))
    assert(exact.nonEmpty, "planted twins produced no pairs at τ=0.9")
    val banded = graft.queries.Dedup.q_dedup_embedding_tight
      .run(spark, dir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"missed=${(exact -- banded).take(5)} extra=${(banded -- exact).take(5)}")
  }

  test("candidate generation prunes the pair space") {
    val c = corpus(TestSpark.sf0001).cache()
    val n = c.count()
    val cand = SignLsh.candidatePairs(c, "vec_id", "e").count()
    val allPairs = n * (n - 1) / 2
    assert(cand < allPairs / 5,
      s"$cand candidates of $allPairs pairs — banding isn't pruning")
    c.unpersist()
  }

  test("band keys are deterministic across invocations") {
    val c = corpus(TestSpark.sf0001)
    val k1 = SignLsh.bandKeys(c, "vec_id", "e", bands = 4, bits = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val k2 = SignLsh.bandKeys(c, "vec_id", "e", bands = 4, bits = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(k1 == k2)
  }

  test("physical plan contains no cartesian product") {
    val plan = graft.queries.Dedup.q_dedup_embedding_tight
      .run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
