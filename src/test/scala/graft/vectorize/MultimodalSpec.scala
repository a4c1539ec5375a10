package graft.vectorize

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sampleDf = {
    val rows = Seq(
      Row(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8"), "/img/1.png"),
      Row(2L, "audio", "fake-wav-bytes-bbbbbb".getBytes("UTF-8"), "/aud/2.wav"),
      Row(3L, "video", "fake-mp4-bytes-cccccccc".getBytes("UTF-8"), "/vid/3.mp4"),
      Row(4L, "text", "spark native multimodal engine".getBytes("UTF-8"), "/txt/4.txt"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.schema)
  }

  test("featurize dispatches all modalities and unit-normalizes") {
    val out = Multimodal.featurize(sampleDf, dim = 8).cache()
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("id", "modality", "embedding"))
    val norms = out.select(col("id"), VectorF.l2Norm(col("embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    norms.foreach { case (id, n) => assert(math.abs(n - 1.0) < 1e-5, s"id $id norm $n") }
    val dims = out.select(size(col("embedding"))).collect().map(_.getInt(0))
    assert(dims.forall(_ == 8))
  }

  test("featurize is deterministic") {
    val a = Multimodal.featurize(sampleDf, 8).collect().sortBy(_.getLong(0)).mkString
    val b = Multimodal.featurize(sampleDf, 8).collect().sortBy(_.getLong(0)).mkString
    assert(a == b)
  }

  test("unknown modality decoder lookup fails loudly") {
    intercept[IllegalArgumentException](Multimodal.decoderFor("molecule3d"))
  }

  test("clipSplit windows a samples column into fixed clips") {
    import spark.implicits._
    val df = Seq((1L, (1 to 10).map(_.toFloat), 2))
      .toDF("item_id", "samples", "rate")
    // rate=2, clipSeconds=2 -> clipLen 4 -> clips: 4,4,2
    val out = Multimodal.clipSplit(df, "samples", "rate", 2.0)
      .select(col("item_id"), col("clip_idx"), size(col("clip")).as("len"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sorted
    assert(out.toSeq == Seq((0, 4), (1, 4), (2, 2)))
  }
}
