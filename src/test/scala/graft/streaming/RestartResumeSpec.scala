package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint restart-resume under the replay oracle — the failure mode
  * checkpoints exist for, which MultiBatchReplaySpec (state carry-over
  * across batches) does not reach: each streaming entry's transform is
  * driven over a two-phase landing dir — two chronological chunks, a
  * clean STOP, two more chunks arriving while the query is down, then a
  * RESTART from the same checkpoint — and the final output must equal
  * the batch result over all four chunks (the entries' oracle
  * statement). Append-mode entries write a parquet FILE sink (its
  * _spark_metadata log is the exactly-once surface a restart must not
  * duplicate into); the Complete-mode windowed aggregate restarts into a
  * memory sink whose final table only equals the full result if window
  * state really was recovered from the checkpoint. Batch-id continuity
  * (first resumed batch ≥ the batches committed before the stop) proves
  * the second start RESUMED rather than reprocessing from scratch.
  *
  * Reference tie: the persistent-workflow TODO
  * (radient/orchestrate/workflow.py:55-56) — restart-with-history is
  * the half of persistence the ingest contract needs.
  */
class RestartResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_rr_$tag")
    d.toFile.deleteOnExit()
    d
  }

  /** All four staged event chunks, oldest-first. */
  private lazy val chunks: Seq[java.nio.file.Path] = {
    val staged = graft.queries.StreamingQ.stageChunks(
      spark, TestSpark.sf0001, "rr", 4)
    java.nio.file.Files.list(staged).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
  }

  /** Copy chunk `i` (0-based) into the landing dir, preserving the
    * strictly-increasing mod-time order the file source sorts by. */
  private def land(landing: java.nio.file.Path, i: Int): Unit = {
    val src = chunks(i)
    val dst = landing.resolve(src.getFileName.toString)
    java.nio.file.Files.copy(src, dst)
    dst.toFile.setLastModified(src.toFile.lastModified())
    ()
  }

  private def eventStream(landing: java.nio.file.Path): DataFrame =
    spark.readStream.schema(Streams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)

  /** Run `mkQuery` over the two-phase landing: phase 1 sees chunks 0-1,
    * stop, chunks 2-3 arrive, phase 2 resumes from the same checkpoint.
    * Returns (batches committed in phase 1, first batch id of phase 2,
    * the restarted query's sink after processing everything). */
  private def twoPhase(tag: String)(
      start: (java.nio.file.Path, java.nio.file.Path) =>
        org.apache.spark.sql.streaming.StreamingQuery)
      : (Long, Long) = {
    val landing = tmpDir(s"${tag}_land")
    val ck = tmpDir(s"${tag}_ck")
    land(landing, 0); land(landing, 1)
    val q1 = start(landing, ck)
    val phase1Batches =
      try { q1.processAllAvailable(); q1.lastProgress.batchId + 1 }
      finally q1.stop()
    land(landing, 2); land(landing, 3)
    val q2 = start(landing, ck)
    try {
      q2.processAllAvailable()
      val resumedFirst = q2.recentProgress.headOption
        .map(_.batchId).getOrElse(q2.lastProgress.batchId)
      (phase1Batches, resumedFirst)
    } finally q2.stop()
  }

  test("windowed aggregate (Complete mode): restart recovers window state") {
    val name = "rr_windowed"
    def agg(df: DataFrame): DataFrame = df
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val (p1, resumedFirst) = twoPhase("win") { (landing, ck) =>
      agg(eventStream(landing)).writeStream
        .outputMode("complete")
        .option("checkpointLocation", ck.toString)
        .format("memory").queryName(name).start()
    }
    assert(p1 >= 2, s"phase 1 committed $p1 batches")
    assert(resumedFirst >= p1, s"resume started at batch $resumedFirst, not after $p1")
    val got = spark.table(name)
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val want = agg(graft.core.Tables(spark, TestSpark.sf0001, "events")
        .select(Streams.eventSchema.fieldNames.map(col): _*))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(got == want, "restarted Complete-mode result must equal the batch aggregate")
  }

  test("streaming dedup (Append mode): file sink is exactly-once across restart") {
    val out = tmpDir("dd_out")
    def dd(df: DataFrame): DataFrame =
      Streams.dedupWithinWatermark(
          df.select(col("user_id"), col("event_type"), col("ts")),
          Seq("user_id", "event_type"), watermarkDelay = "35 days")
        .select(col("user_id"), col("event_type"))
    val (p1, resumedFirst) = twoPhase("dd") { (landing, ck) =>
      dd(eventStream(landing)).writeStream
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .format("parquet").option("path", out.toString).start()
    }
    assert(p1 >= 2 && resumedFirst >= p1)
    val got = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = graft.core.Tables(spark, TestSpark.sf0001, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.toSet == want, "resumed dedup must equal batch DISTINCT")
    assert(got.length == want.size,
      s"exactly-once violated: ${got.length} rows for ${want.size} keys")
  }

  test("interval join (Append mode): buffered-state recovery across restart") {
    val out = tmpDir("j_out")
    def joined(df: DataFrame): DataFrame = {
      val p = df.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
        .withWatermark("pts", "30 minutes")
      val c = df.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
        .withWatermark("cts", "30 minutes")
      p.join(c,
          expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"))
        .select(col("pid"), col("cid"))
    }
    val (p1, resumedFirst) = twoPhase("j") { (landing, ck) =>
      joined(eventStream(landing)).writeStream
        .outputMode("append")
        .option("checkpointLocation", ck.toString)
        .format("parquet").option("path", out.toString).start()
    }
    assert(p1 >= 2 && resumedFirst >= p1)
    val got = spark.read.parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ev = graft.core.Tables(spark, TestSpark.sf0001, "events")
    val want = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
      .join(ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts")),
        expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"))
      .select(col("pid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == want, "resumed interval join must equal the batch join")
    assert(got.length == want.size,
      s"exactly-once violated: ${got.length} rows for ${want.size} pairs")
  }
}
