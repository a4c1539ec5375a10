package graft.index

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The quantizer-drift loop: [[IvfIndex.servingDrift]] (monitor) and
  * [[IvfIndex.refitCompact]] (actuator). A resident corpus of two tight
  * gaussian balls fits the quantizer; streamed blocks arrive from a
  * THIRD ball the quantizer never saw — the monitor's streamed/resident
  * ratio must scream, and the refit must fold the blocks in, re-encode,
  * swap atomically, and collapse the drift. The measured drift→recall
  * curve at bench SF is SCALE.md's ivf_drift row. */
class IvfRefitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8

  /** n points in a ±0.05 cube around a center at `center·1⃗` with ids
    * from `idBase` — deterministic (hash-jittered). */
  private def ball(n: Int, center: Double, idBase: Long): DataFrame =
    spark.range(n).select(
      (col("id") + idBase).as("vec_id"),
      expr(s"""transform(sequence(1, $dim), j ->
        ${center}D + (pmod(xxhash64(id * 31 + j), 100) - 50) / 1000D)""")
        .as("embedding"))

  private def freshPath(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_refit_spec")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def meanAssignDist(path: String): Double = {
    val cents = spark.read.parquet(s"$path/centroids")
    spark.read.parquet(s"$path/assign")
      .join(broadcast(cents), Seq("cluster"))
      .agg(avg(graft.functions.VectorF.l2Dist(
        col("embedding").cast("array<double>"), col("centroid"))))
      .head().getDouble(0)
  }

  test("servingDrift screams on out-of-distribution streamed blocks, " +
      "and refitCompact folds + re-encodes + collapses it") {
    val resident = ball(120, 0.0, 0L).unionByName(ball(120, 1.0, 1000L))
    val streamed = ball(120, 3.0, 2000L) // a ball the quantizer never saw
    val model = IvfIndex.build(resident, "vec_id", "embedding", k = 2)
    val path = freshPath()
    IvfIndex.save(model, path)
    (0 until 3).foreach { b =>
      IvfIndex.appendStreamBlock(model, path,
        streamed.filter(pmod(col("vec_id"), lit(3)) === lit(b.toLong)), b)
    }
    val (res, str) = IvfIndex.servingDrift(spark, path, "embedding")
    assert(!res.isNaN && !str.isNaN)
    assert(str / res > 3.0,
      s"drift monitor must scream on a never-seen ball: ratio ${str / res}")
    // encode quality over the whole SERVING UNION under the frozen
    // quantizer: 240 resident rows at `res` + 120 streamed rows at `str`
    val beforeDist = (res * 240 + str * 120) / 360

    val refitted = IvfIndex.refitCompact(spark, path, "vec_id", "embedding")
    // layout: stream blocks folded and gone, staging cleaned, k preserved
    assert(!new java.io.File(s"$path/assign_stream").exists,
      "refit must fold the stream blocks away")
    assert(!new java.io.File(s"$path/refit_stage").exists,
      "staging dir must be cleaned after the swap")
    assert(refitted.centroids.length == 2)
    // every row preserved, exactly once
    assert(refitted.assign.count() == 360)
    assert(refitted.assign.select("vec_id").distinct().count() == 360)
    // the refit quantizer has SEEN the streamed ball: overall encode
    // quality improves and the monitor goes quiet (no stream side left)
    val afterDist = meanAssignDist(path)
    assert(afterDist < beforeDist,
      s"refit must improve encode quality: $afterDist !< $beforeDist")
    val (res2, str2) = IvfIndex.servingDrift(spark, path, "embedding")
    assert(!res2.isNaN && str2.isNaN,
      "post-refit there is no streamed side to drift")
    // and the refitted index actually finds streamed-ball neighbours:
    // a query in the third ball must return third-ball ids
    val q = ball(1, 3.0, 9000L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = refitted.search(q, "qid", "qv", k = 5, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0))
    assert(got.length == 5 && got.forall(id => id >= 2000L && id < 3000L),
      s"nprobe-1 search near the streamed ball must stay in it, got ${got.toSeq}")
  }

  test("refitCompact on an index with NO stream blocks is a pure refit " +
      "(row-preserving, layout intact)") {
    val resident = ball(80, 0.0, 0L).unionByName(ball(80, 2.0, 500L))
    val model = IvfIndex.build(resident, "vec_id", "embedding", k = 2)
    val path = freshPath()
    IvfIndex.save(model, path)
    val refitted = IvfIndex.refitCompact(spark, path, "vec_id", "embedding")
    assert(refitted.assign.count() == 160)
    assert(refitted.centroids.length == 2)
    assert(!new java.io.File(s"$path/refit_stage").exists)
  }

  test("refit_compact_index registry verb swaps the layout and returns " +
      "the re-encoded assignment") {
    val resident = ball(60, 0.0, 0L).unionByName(ball(60, 1.5, 300L))
    val streamed = ball(60, 4.0, 600L)
    val model = IvfIndex.build(resident, "vec_id", "embedding", k = 2)
    val path = freshPath()
    IvfIndex.save(model, path)
    IvfIndex.appendStreamBlock(model, path, streamed, 0L)
    val out = graft.pipeline.Operators.make(spark, "sink", "refit_compact_index",
      Map("path" -> path))(Seq.empty, Map.empty)
    assert(out.count() == 180)
    assert(!new java.io.File(s"$path/assign_stream").exists)
  }
}
