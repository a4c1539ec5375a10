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

  test("streamed block appends to a SAVED index: O(batch) files, served on load") {
    // the production deployment shape: the index lives on durable
    // storage, the stream appends encoded blocks (appendToSaved — no
    // read-modify-write of existing blocks), serving reloads
    val emb = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
    val base = emb.filter(col("vec_id") >= 100)
    val arriving = emb.filter(col("vec_id") < 100)

    val model = IvfIndex.build(base, "vec_id", "embedding", k = 8)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_stream_idx").toString
    IvfIndex.save(model, idxDir)

    def dataFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(idxDir))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = dataFiles()

    val landing = java.nio.file.Files.createTempDirectory("graft_ingest2")
    arriving.repartition(6).write.mode("overwrite").parquet(landing.toString)
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val staged = batch.select("vec_id", "embedding").cache()
        staged.count()
        IvfIndex.appendToSaved(model, idxDir, staged)
        staged.unpersist()
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    // O(batch): every pre-existing block file is byte-untouched — the
    // stream only ever ADDED files
    val after = dataFiles()
    assert(before.forall { case (p, m) => after.get(p).contains(m) },
      "streamed appends must not rewrite existing index blocks")
    assert(after.size > before.size)

    // the reloaded index serves the full corpus, including streamed rows
    val served = IvfIndex.load(spark, idxDir, "vec_id", "embedding")
    assert(served.assign.count() == 500)
    val probe = arriving.filter(col("vec_id") === 42)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = served.search(probe, "qid", "qv", k = 1, nprobe = 8).collect()
    assert(top.length == 1 && top(0).getLong(1) == 42L)
  }
}
