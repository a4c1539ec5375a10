package graft.pipeline

import graft.TestSpark
import graft.functions.VectorF
import graft.sink.VectorTable
import graft.vectorize.HashEmbed
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end: the reference's flagship insert + filtered-search
  * pipeline (examples/multimodal_rag.md — source → vectorize → sink
  * insert, then query → vectorize → filtered top-k search), run through
  * the Workflow DAG against the documents fixture, with the brute-force
  * ranking as the expected result. */
class RagGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val DIM = 16

  test("insert pipeline + filtered search matches brute-force ranking") {
    val tableDir = Files.createTempDirectory("graft_rag").toString

    // ---- insert workflow: read -> embed -> normalize -> sink write
    val insert = new Workflow()
      .source("docs", spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"))
      .map("embed", _.select(col("doc_id"), col("lang"),
        VectorF.normalize(HashEmbed.embed(col("text"), DIM)).as("embedding")))
    val embedded = insert.execute()
    VectorTable.write(embedded, tableDir, "doc_id", "embedding")

    // ---- search workflow: embed the query text the same way, filtered top-k
    val query = "the quick brown fox"
    val qv = spark.range(1).select(
        VectorF.normalize(HashEmbed.embed(lit(query), DIM)).as("qv"))
      .head().getSeq[Double](0)
    val table = VectorTable.load(spark, tableDir)
    val got = VectorTable.search(table, "embedding", qv, k = 5,
        metric = "cosine", filter = Some(col("lang") === "en"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq

    // ---- expected: brute-force cosine over the same embedded table
    val expected = embedded.filter(col("lang") === "en")
      .select(col("doc_id"),
        VectorF.cosine(col("embedding"), array(qv.map(lit): _*)).as("cos"))
      .orderBy(desc("cos"), col("doc_id"))
      .limit(5).select("doc_id").collect().map(_.getLong(0)).toSeq

    assert(got.toSet == expected.toSet,
      s"filtered search returned $got, brute force says $expected")
    // search result must respect the filter
    val langs = VectorTable.search(table, "embedding", qv, k = 5,
        metric = "cosine", filter = Some(col("lang") === "en"))
      .select("lang").collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
  }
}
