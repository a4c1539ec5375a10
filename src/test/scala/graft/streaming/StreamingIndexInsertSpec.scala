package graft.streaming

import graft.TestSpark
import graft.index.GannIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Streaming index maintenance (IndexMaintain + GannIndex
  * appendStreamBlock/loadServing): restart-resume across a checkpoint,
  * exactly-once block appends (the served union must equal the one-shot
  * appendToSaved twin as a MULTISET — a replayed micro-batch after the
  * restart would show up as duplicate rows), and the serving search
  * reaching streamed vectors. */
class StreamingIndexInsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sii_$tag")
    d.toFile.deleteOnExit()
    d
  }

  /** Deterministic spread vectors — no RNG, stable across runs. */
  private def vecs(from: Long, until: Long): DataFrame =
    spark.range(from, until).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), j -> cos(id * 0.37 + j * 1.09))")
        .as("embedding"))

  /** Land rows as ONE parquet chunk file with a pinned mod time (the
    * file source processes oldest-first). */
  private def land(landing: java.nio.file.Path, df: DataFrame,
      i: Int, base: Long): Unit = {
    val staging = tmp(s"stage$i")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    val dest = landing.resolve(f"chunk$i%03d.parquet")
    java.nio.file.Files.move(part, dest)
    dest.toFile.deleteOnExit()
    dest.toFile.setLastModified(base + i * 2000L)
    ()
  }

  private def stream(landing: java.nio.file.Path): DataFrame =
    spark.readStream.schema(vecs(0, 1).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)

  private def assignCounts(assign: DataFrame): Map[(Int, Int, Long), Int] =
    assign.select(col("tree"), col("leaf"), col("vec_id")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap

  test("restart-resume: served union equals the one-shot append twin " +
      "exactly once; the search reaches streamed vectors") {
    val initial = vecs(0, 300)
    val streamed = vecs(300, 400)
    val model = GannIndex.build(initial, "vec_id", "embedding",
      leafSize = 50, spill = 0.15, nTrees = 2)
    val p1 = tmp("live"); val p2 = tmp("oneshot")
    GannIndex.save(model, p1.toString)
    GannIndex.save(model, p2.toString)
    GannIndex.appendToSaved(model, p2.toString, streamed)

    val landing = tmp("land"); val ck = tmp("ck")
    val base = System.currentTimeMillis()
    def chunk(i: Int): DataFrame = vecs(300 + i * 25L, 300 + (i + 1) * 25L)
    // phase 1: two chunks arrive, two micro-batches append, stop
    land(landing, chunk(0), 0, base); land(landing, chunk(1), 1, base)
    val q1 = IndexMaintain.maintainGann(
      stream(landing), model, p1.toString, ck.toString)
    try q1.processAllAvailable() finally q1.stop()
    // two more arrive; phase 2 resumes from the SAME checkpoint
    land(landing, chunk(2), 2, base); land(landing, chunk(3), 3, base)
    val q2 = IndexMaintain.maintainGann(
      stream(landing), model, p1.toString, ck.toString)
    try q2.processAllAvailable() finally q2.stop()

    val served = GannIndex.loadServing(spark, p1.toString,
      "vec_id", "embedding")
    val oneShot = GannIndex.load(spark, p2.toString, "vec_id", "embedding")
    // exactly-once: multiset equality — a duplicated replay would double
    // some (tree, leaf, vec_id) count; a dropped batch would zero it
    assert(assignCounts(served.assign) == assignCounts(oneShot.assign),
      "stream-maintained assignment diverges from the one-shot twin")
    assert(served.leaves.toSet == oneShot.leaves.toSet)

    // the serving search must reach streamed rows: each streamed query's
    // own id is its 0-distance nearest neighbour when self is not excluded
    val queries = vecs(300, 310)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = served.search(queries, "qid", "qv", k = 3,
        excludeSelf = false)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (300L until 310L).foreach(q =>
      assert(got.getOrElse(q, Set.empty).contains(q),
        s"streamed vector $q unreachable through the served index"))
  }

  test("IVF twin + compaction: stream-maintained serving equals the " +
      "one-shot twin; compactStreamBlocks folds blocks losslessly") {
    import graft.index.{Blocks, IvfIndex}
    def ivfCounts(assign: org.apache.spark.sql.DataFrame) =
      assign.select(col("cluster"), col("vec_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val initial = vecs(0, 300)
    val streamed = vecs(300, 400)
    val model = IvfIndex.build(initial, "vec_id", "embedding", k = 4)
    val p1 = tmp("ivflive"); val p2 = tmp("ivfone")
    IvfIndex.save(model, p1.toString)
    IvfIndex.save(model, p2.toString)
    IvfIndex.appendToSaved(model, p2.toString, streamed)

    val landing = tmp("ivfland"); val ck = tmp("ivfck")
    val base = System.currentTimeMillis()
    def chunk(i: Int): DataFrame = vecs(300 + i * 25L, 300 + (i + 1) * 25L)
    land(landing, chunk(0), 0, base); land(landing, chunk(1), 1, base)
    val q1 = IndexMaintain.maintainIvf(
      stream(landing), model, p1.toString, ck.toString)
    try q1.processAllAvailable() finally q1.stop()
    land(landing, chunk(2), 2, base); land(landing, chunk(3), 3, base)
    val q2 = IndexMaintain.maintainIvf(
      stream(landing), model, p1.toString, ck.toString)
    try q2.processAllAvailable() finally q2.stop()

    val served = IvfIndex.loadServing(spark, p1.toString,
      "vec_id", "embedding")
    val oneShot = IvfIndex.load(spark, p2.toString, "vec_id", "embedding")
    val pre = ivfCounts(served.assign)
    assert(pre == ivfCounts(oneShot.assign),
      "stream-maintained IVF assignment diverges from the one-shot twin")

    // compaction (maintenance window, stream stopped): fold the batch
    // blocks into the base partition layout; a PLAIN load must now see
    // exactly the pre-compaction serving multiset, and a second compact
    // is a no-op
    assert(Blocks.compactStreamBlocks(spark, p1.toString, Seq("cluster")))
    val post = ivfCounts(IvfIndex.load(spark, p1.toString,
      "vec_id", "embedding").assign)
    assert(pre == post, "compaction changed the assignment multiset")
    assert(!Blocks.compactStreamBlocks(spark, p1.toString, Seq("cluster")),
      "compaction of an already-compacted index must be a no-op")
  }

  test("GANN compaction folds stream blocks into the (tree, leaf) " +
      "layout losslessly") {
    import graft.index.Blocks
    val model = GannIndex.build(vecs(0, 300), "vec_id", "embedding",
      leafSize = 50, spill = 0.15, nTrees = 2)
    val path = tmp("ganncompact").toString
    GannIndex.save(model, path)
    GannIndex.appendStreamBlock(model, path, vecs(300, 350), batchId = 0L)
    GannIndex.appendStreamBlock(model, path, vecs(350, 400), batchId = 1L)
    val pre = assignCounts(
      GannIndex.loadServing(spark, path, "vec_id", "embedding").assign)
    assert(Blocks.compactStreamBlocks(spark, path, Seq("tree", "leaf")))
    // a PLAIN load (no stream-block union) must now see the full multiset
    val post = assignCounts(
      GannIndex.load(spark, path, "vec_id", "embedding").assign)
    assert(pre == post, "compaction changed the (tree, leaf) assignment")
    assert(!Blocks.compactStreamBlocks(spark, path, Seq("tree", "leaf")),
      "second compaction must be a no-op")
  }

  test("idempotent block replay: re-appending a batch id replaces, " +
      "never duplicates") {
    val model = GannIndex.build(vecs(0, 200), "vec_id", "embedding",
      leafSize = 50, spill = 0.15, nTrees = 2)
    val p = tmp("replay")
    GannIndex.save(model, p.toString)
    val batch = vecs(200, 250)
    GannIndex.appendStreamBlock(model, p.toString, batch, batchId = 0L)
    val once = assignCounts(GannIndex.loadServing(spark, p.toString,
      "vec_id", "embedding").assign)
    // the at-least-once replay: same batch id lands again
    GannIndex.appendStreamBlock(model, p.toString, batch, batchId = 0L)
    val twice = assignCounts(GannIndex.loadServing(spark, p.toString,
      "vec_id", "embedding").assign)
    assert(once == twice, "replayed batch block duplicated rows")
  }
}
