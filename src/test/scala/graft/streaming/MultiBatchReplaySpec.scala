package graft.streaming

import graft.TestSpark
import graft.queries.StreamingQ
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming entries must execute as REAL multi-micro-batch replays:
  * a single-batch replay (round ≤8's one staged file) can never exercise
  * watermark advancement, cross-batch state carry-over, or mid-run
  * eviction — exactly the machinery a continuous pipeline depends on.
  * This suite runs each entry and asserts, via the batch counter
  * [[Streams.batchesExecuted]], that several micro-batches actually ran
  * (the staging writes 4 chronological chunks with maxFilesPerTrigger=1,
  * so ≥4 data batches plus possibly trailing no-data batches), and that
  * the chunked landing dir really carries the corpus chronologically
  * partitioned.
  *
  * Correctness across those batches is pinned elsewhere: the DuckDB
  * oracle + StreamingEntryParitySpec check the RESULTS; this suite
  * checks the replays can't silently degrade back to one batch.
  */
class MultiBatchReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertMultiBatch(sink: String): Unit = {
    val n = Streams.batchesExecuted(sink)
    assert(n.exists(_ >= 4),
      s"$sink executed ${n.getOrElse(-1L)} micro-batches — the chronological " +
        "multi-file replay must cross batch boundaries")
  }

  test("q_stream_windowed runs as >=4 micro-batches") {
    StreamingQ.q_stream_windowed.run(spark, TestSpark.sf0001).count()
    assertMultiBatch("q_stream_windowed_sink")
  }

  test("q_stream_dedup carries suppression state across >=4 micro-batches") {
    StreamingQ.q_stream_dedup.run(spark, TestSpark.sf0001).count()
    assertMultiBatch("q_stream_dedup_sink")
  }

  test("q_stream_join evicts interval state across >=4 micro-batches") {
    StreamingQ.q_stream_join.run(spark, TestSpark.sf0001).count()
    assertMultiBatch("q_stream_join_sink")
  }

  test("q_stream_curate carries dedup-keeper state across >=4 micro-batches") {
    StreamingQ.q_stream_curate.run(spark, TestSpark.sf0001).count()
    assertMultiBatch("q_stream_curate_sink")
  }

  test("q_stream_domain_cap merges per-source heap state across >=4 micro-batches") {
    StreamingQ.q_stream_domain_cap.run(spark, TestSpark.sf0001).count()
    assertMultiBatch("q_stream_domain_cap_sink")
    // the bounded-state claim, MEASURED: one state row (serialized k=3
    // heap buffer) per source — 20 at this SF — never the corpus size
    val nSources = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("source").distinct().count()
    assert(Streams.stateRows("q_stream_domain_cap_sink").contains(nSources),
      s"state rows ${Streams.stateRows("q_stream_domain_cap_sink")} != " +
        s"$nSources sources — per-source heap state leaked")
  }

  test("staging writes chronological chunks: per-file ts ranges are disjoint and ordered") {
    val landing = StreamingQ
      .stageChunks(spark, TestSpark.sf0001, "chunkcheck", numFiles = 4).toFile
    val files = landing.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, s"expected 4 chunks, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("ts")).cast("long"), max(col("ts")).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sliding(2).foreach { case Array((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin,
        s"chunk ranges overlap: $aMax > $bMin — staging must be chronological")
    }
    // mod times strictly increase in chunk order (pins oldest-first pickup)
    files.map(_.lastModified()).sliding(2).foreach { case Array(a, b) =>
      assert(a < b, "chunk modification times must strictly increase")
    }
  }
}
