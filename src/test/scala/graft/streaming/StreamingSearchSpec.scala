package graft.streaming

import graft.TestSpark
import graft.index.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming query serving: a continuously-arriving stream of query
  * vectors answered per micro-batch through the SAME `ann_search`
  * registry transform a batch workflow uses — the serving half of the
  * continuous-ingest deployment (StreamingIngestSpec is the write
  * half). Streamed answers must equal the all-at-once batch search. */
class StreamingSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed query batches through ann_search equal the batch search") {
    val emb = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
    val model = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_serve_idx").toString
    IvfIndex.save(model, idxDir)

    val queries = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("qid"), col("embedding").as("qv")).cache()

    // batch reference: all 40 queries at once through the registry op
    val search = graft.pipeline.Operators.make(spark, "transform", "ann_search",
      Map("index" -> "ivf", "path" -> idxDir, "idCol" -> "vec_id",
        "vecCol" -> "embedding", "qidCol" -> "qid", "qvecCol" -> "qv",
        "k" -> "5", "nprobe" -> "8"))
    val expected = search(Seq(queries), Map.empty)
      .collect().map(_.toString).sorted.toSeq

    // stream the same queries file-by-file, searching per micro-batch
    val landing = java.nio.file.Files.createTempDirectory("graft_serve_q")
    queries.repartition(5).write.mode("overwrite").parquet(landing.toString)
    val results = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val q = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val staged = batch.cache(); staged.count()
        search(Seq(staged), Map.empty).collect()
          .foreach(r => results.add(r.toString))
        staged.unpersist()
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    assert(results.asScala.sorted.toSeq == expected,
      "per-micro-batch serving must answer exactly like batch serving")
    assert(expected.nonEmpty)
  }
}
