package graft.vectorize

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The external-process demux seam and the binary page fan-out. The real
  * codecs (ffmpeg, pymupdf) are not in this container, so the subprocess
  * seam is exercised with a trivial substitute binary (/bin/cat): the
  * frames must reconstruct the payload exactly, proving the pipe plumbing
  * (threaded stdin writer, full stdout read, frame chunking) is sound.
  */
class SubprocessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def payloads = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")),
      (2L, Array.tabulate(1000)(i => (i % 251).toByte)),
      (3L, Array.emptyByteArray))
      .toDF("id", "data")
  }

  test("cat demux reconstructs every payload from its frames") {
    val frames = Multimodal.subprocessDemux(payloads, Seq("/bin/cat"), frameBytes = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val rebuilt = frames.groupBy(_._1).map { case (id, fs) =>
      id -> fs.sortBy(_._2).flatMap(_._3)
    }
    val expected = payloads.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rebuilt.keySet == Set(1L, 2L), "empty payload must yield no frames")
    for ((id, bytes) <- rebuilt)
      assert(java.util.Arrays.equals(bytes.toArray, expected(id)),
        s"payload $id not reconstructed")
    // frame sizing: 1000 bytes at 7 per frame → 143 frames for id 2
    assert(frames.count(_._1 == 2L) == 143)
  }

  test("a failing subprocess fails the job instead of truncating output") {
    val ex = intercept[Exception] {
      Multimodal.subprocessDemux(payloads, Seq("/bin/false"), frameBytes = 7)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("exited"))))
  }

  test("pageSplit fans out fixed-size pages and drops empty payloads") {
    val pages = Multimodal.pageSplit(payloads, "data", pageBytes = 16)
      .select(col("id"), col("page_idx"), octet_length(col("page_data")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // id 1: 43 bytes → 16+16+11; id 2: 1000 → 62×16 + 8; id 3: empty → none
    assert(pages.filter(_._1 == 1L).map(_._3).toSeq == Seq(16, 16, 11))
    assert(pages.count(_._1 == 2L) == 63)
    assert(pages.filter(_._1 == 2L).map(_._3).sum == 1000)
    assert(!pages.exists(_._1 == 3L))
  }

  test("page rows flow on through the stub featurizer (screenshot shape)") {
    val pages = Multimodal.pageSplit(payloads, "data", pageBytes = 16)
      .select(col("id"), lit("image").as("modality"), col("page_data").as("data"))
    val feats = Multimodal.featurize(pages, dim = 4)
    assert(feats.count() == 3 + 63)
    assert(feats.select(size(col("embedding"))).distinct().head.getInt(0) == 4)
  }
}
