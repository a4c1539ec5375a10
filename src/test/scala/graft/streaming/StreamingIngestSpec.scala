package graft.streaming

import graft.TestSpark
import graft.index.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent-workflow composition the reference leaves as a TODO
  * (workflow.py:55-56): a continuously-arriving vector stream maintained
  * in a serving index via the frozen-quantizer insert — Structured
  * Streaming `foreachBatch` + `IvfIndex.insert` per micro-batch. */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("foreachBatch insert keeps the IVF index current with the stream") {
    val emb = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
    val base = emb.filter(col("vec_id") >= 100)
    val arriving = emb.filter(col("vec_id") < 100)

    // the index exists before the stream starts (built on the corpus so
    // far); the stream only ever appends through insert()
    var model = IvfIndex.build(base, "vec_id", "embedding", k = 8)

    // stage the arriving batch as parquet and stream it file-by-file —
    // 18 files = 18 micro-batch inserts, crossing the Compact.append
    // lineage-truncation boundary (every 16th append) mid-stream
    val landing = java.nio.file.Files.createTempDirectory("graft_ingest")
    arriving.repartition(18).write.mode("overwrite").parquet(landing.toString)
    val schema = emb.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // several micro-batches
      .parquet(landing.toString)

    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // cache the micro-batch first: insert() unions a streaming-born
        // frame into a static plan, so materialize it as static rows
        val staged = batch.select("vec_id", "embedding").cache()
        staged.count()
        model = IvfIndex.insert(model, staged)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    assert(model.assign.count() == 500)
    assert(model.assign.select("vec_id").distinct().count() == 500)
    // the loop crossed a compaction: plan depth stayed bounded
    assert(model.appends >= 17)
    val unions = model.assign.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions < graft.index.Compact.DefaultEvery)
    // a streamed-in vector is now served: its own embedding finds it
    val probe = arriving.filter(col("vec_id") === 42)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = model.search(probe, "qid", "qv", k = 1, nprobe = 8).collect()
    assert(top.length == 1 && top(0).getLong(1) == 42L)
  }
}
