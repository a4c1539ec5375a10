package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[IvfIndex.hashSample]]: quantizer fits must be storage-order
  * INDEPENDENT — a bare `.limit(n)` takes the first partitions in
  * whatever order the corpus is laid out (at 100 TB that's one shard of
  * a time-partitioned table), biasing the codebooks. The hash-ordered
  * sample picks the same rows no matter how the input is partitioned. */
class FitSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()

  test("PQ codebooks identical after arbitrary repartitioning") {
    // fitSample < row count so the sample genuinely selects a subset
    val a = PqIndex.build(emb, "vec_id", "embedding",
      m = 8, ksub = 16, fitSample = 200)
    val b = PqIndex.build(emb.repartition(17), "vec_id", "embedding",
      m = 8, ksub = 16, fitSample = 200)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
  }

  test("balanced-IVF centroids identical after arbitrary repartitioning") {
    val a = IvfIndex.build(emb, "vec_id", "embedding",
      k = 4, balance = true, fitSample = 200)
    val b = IvfIndex.build(emb.repartition(13), "vec_id", "embedding",
      k = 4, balance = true, fitSample = 200)
    assert(a.centroids.map { case (i, c) => (i, c.toSeq) }.toSeq ==
      b.centroids.map { case (i, c) => (i, c.toSeq) }.toSeq)
  }

  test("hash sample is a spread sample, not a storage prefix") {
    // the first-200-rows prefix and the hash-ordered 200 must differ —
    // otherwise the sampler degenerated back to limit()
    val prefix = emb.select(col("vec_id")).limit(200)
      .collect().map(_.getLong(0)).toSet
    val spread = emb.select(col("vec_id"),
        xxhash64(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(200)
      .collect().map(_.getLong(0)).toSet
    assert(prefix != spread)
  }
}
