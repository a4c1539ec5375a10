package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Durable lineage truncation for the compacting ingest loop: when the
  * session has a checkpoint dir (the cluster deployment shape),
  * [[Compact.append]] auto-routes its every-Nth-insert truncation
  * through the RELIABLE `checkpoint()` — state survives executor loss,
  * where `localCheckpoint` blocks die with their executor. This spec
  * drives the same insert loop as StreamingIngestSpec across a
  * truncation boundary with a checkpoint dir set, and asserts the
  * truncation really wrote through it (files exist under the dir), the
  * plan stayed bounded, and the index still serves every row.
  */
class ReliableCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    else Seq(f)

  test("checkpoint-dir session: compaction truncates through reliable checkpoints") {
    val emb = spark.read
      .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
    val base = emb.filter(col("vec_id") >= 100)
    val arriving = emb.filter(col("vec_id") < 100).cache()

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    // the shared session outlives this suite: restore the unset state so
    // later suites exercise Compact.append's localCheckpoint auto-detect
    // branch instead of silently routing through this temp dir (the
    // field is private[spark]; reflection is the only unset path)
    def clearCheckpointDir(): Unit =
      try {
        val f = classOf[org.apache.spark.SparkContext]
          .getDeclaredField("checkpointDir")
        f.setAccessible(true)
        f.set(spark.sparkContext, None)
      } catch { case _: ReflectiveOperationException => () }
    try {

    var model = IvfIndex.build(base, "vec_id", "embedding", k = 8)
    (0 until 17).foreach { i =>
      val b = arriving.filter(pmod(col("vec_id"), lit(17)) === i)
        .select("vec_id", "embedding").cache()
      b.count()
      model = IvfIndex.insert(model, b)
    }
    assert(model.appends == 17, "must cross the every-16th truncation boundary")

    // the truncation wrote RELIABLE checkpoint data under the configured dir
    val ckptFiles = walk(ckpt.toFile).filter(_.isFile)
    assert(ckptFiles.nonEmpty,
      "no files under the checkpoint dir — truncation fell back to localCheckpoint")

    // lineage is flat post-truncation: bounded Union depth
    val unions = model.assign.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions < Compact.DefaultEvery)

    // correctness across the reliable truncation: full corpus served
    assert(model.assign.count() == 500)
    assert(model.assign.select("vec_id").distinct().count() == 500)
    val probe = arriving.filter(col("vec_id") === 42)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = model.search(probe, "qid", "qv", k = 1, nprobe = 8).collect()
    assert(top.length == 1 && top(0).getLong(1) == 42L)

    } finally clearCheckpointDir()
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "checkpoint dir must not leak into later suites")
  }
}
