package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two boundary semantics `q_stream_sessions`' oracle states
  * arithmetically:
  *
  *  1. MERGE bound — an event at EXACTLY the current session end
  *     (lastTs + gap) MERGES into the session (windows that touch are
  *     merged, not just windows that overlap), so the oracle's
  *     gaps-and-islands break is `ts > lag(ts) + gap` — the same
  *     formulation the batch q_events_session_window oracle uses, now
  *     known exact on any corpus rather than by absence of exact-gap
  *     adjacency. The merge state machine behaves identically whether
  *     the two events arrive in one micro-batch or across a batch
  *     boundary (session-merging state is the operator's whole point).
  *  2. EMISSION bound — in append mode a finalized session emits exactly
  *     when the watermark has reached its end (INCLUSIVE at equality:
  *     `end <= wm` emits), and a session whose end is above the final
  *     watermark stays buffered with no output when the replay ends.
  */
class StreamSessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("session merge across micro-batches, inclusive at lastTs + gap; " +
    "append emission inclusive at end == watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val df = input.toDF.toDF("user_id", "ts")
    val sess = df
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "20 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("start_ts"), $"w.end".as("end_ts"),
        $"n_events")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("session_boundary").start()
    try {
      // b1: u1 two events 10 min apart (one session, end 10:30 after b2's
      // extension); u2 one event (end 10:25); u4 one event (end 10:20).
      input.addData((1L, ts("10:00")), (1L, ts("10:10")),
        (2L, ts("10:05")), (4L, ts("10:00")))
      q.processAllAvailable()
      // b2: u1 event at 10:25 — 10:25 < current end 10:30, MERGES and
      // extends the end to 10:45. u4 event at EXACTLY its session end
      // 10:20 — touching windows merge too: ONE session ending 10:40.
      // u3 at 11:15 advances max event time → final wm = 10:45.
      input.addData((1L, ts("10:25")), (4L, ts("10:20")), (3L, ts("11:15")))
      q.processAllAvailable()

      val rows = spark.table("session_boundary").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      // u2's session end 10:25 < wm 10:45 → emitted
      assert(rows.contains((2L, ts("10:05"), ts("10:25"), 1L)),
        s"u2 finalized session missing in $rows")
      // u4: ONE merged session — the boundary event extends it
      assert(rows.contains((4L, ts("10:00"), ts("10:40"), 2L)),
        s"u4 boundary event must merge (inclusive at lastTs + gap) in $rows")
      // u1: one MERGED session spanning the batch boundary, end 10:45 ==
      // final wm → inclusive emission
      assert(rows.contains((1L, ts("10:00"), ts("10:45"), 3L)),
        s"u1 merged session (end == wm, inclusive) missing in $rows")
      // u3's session end 11:35 > wm → stays buffered
      assert(!rows.exists(_._1 == 3L),
        s"session above the final watermark must stay buffered; got $rows")
      assert(rows.size == 3, s"unexpected extra rows: $rows")
    } finally q.stop()
  }

  test("dynamic gap: session end is the MAX member end (an early " +
    "long-gap event outlasts later short-gap ones); touch still merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF.toDF("user_id", "ts", "kind")
    val sess = df
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts",
        when($"kind" === "long", "30 minutes").otherwise("10 minutes"))
        .as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("start_ts"), $"w.end".as("end_ts"),
        $"n_events")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("session_gap_boundary").start()
    try {
      // u1: long event at 10:00 (end 10:30), then a SHORT event at
      // 10:05 (own end 10:15) — the merged session must keep the long
      // event's later end, not lastTs + gap(last) = 10:15.
      // u2: short at 10:00 (end 10:10), short at EXACTLY 10:10 — touch
      // merges under dynamic gaps too → one session ending 10:20.
      input.addData((1L, ts("10:00"), "long"), (1L, ts("10:05"), "short"),
        (2L, ts("10:00"), "short"), (2L, ts("10:10"), "short"))
      q.processAllAvailable()
      // u3 advances max event time to 11:30 → final wm = 11:00; both
      // u1/u2 sessions end below it and emit, u3's own stays buffered
      input.addData((3L, ts("11:30"), "short"))
      q.processAllAvailable()

      val rows = spark.table("session_gap_boundary").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(rows.contains((1L, ts("10:00"), ts("10:30"), 2L)),
        s"merged end must be the MAX member end (10:30, not 10:15): $rows")
      assert(rows.contains((2L, ts("10:00"), ts("10:20"), 2L)),
        s"touching dynamic-gap windows must merge: $rows")
      assert(!rows.exists(_._1 == 3L),
        s"session above the final watermark must stay buffered: $rows")
      assert(rows.size == 2, s"unexpected extra rows: $rows")
    } finally q.stop()
  }

  test("restart mid-replay: merging-session state recovers from the " +
    "checkpoint; sessions emitted before the stop never re-emit") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    def tmp(tag: String) = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_sessrs_$tag")
      d.toFile.deleteOnExit(); d
    }
    val landing = tmp("land"); val ck = tmp("ck")
    def land(df: org.apache.spark.sql.DataFrame, i: Int, base: Long): Unit = {
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
    val schema = Seq((0L, ts("00:00"))).toDF("user_id", "ts").schema
    // the memory sink cannot recover from a checkpoint; foreachBatch can
    def attach(into: scala.collection.mutable.Set[(Long, Timestamp, Timestamp, Long)]) = {
      val sess = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
        .withWatermark("ts", "30 minutes")
        .groupBy(session_window($"ts", "20 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("start_ts"), $"w.end".as("end_ts"),
          $"n_events")
      sess.writeStream.outputMode("append")
        .option("checkpointLocation", ck.toString)
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val got = df.collect().map(r => (r.getLong(0), r.getTimestamp(1),
              r.getTimestamp(2), r.getLong(3)))
            into.synchronized { into ++= got; () }
            ()
        }.start()
    }
    val base = System.currentTimeMillis()
    // chunk 1: u5's session (ends 09:20) finalizes under the post-batch
    // watermark 09:40 and emits BEFORE the stop; u1/u2 sessions stay open
    land(Seq((5L, ts("09:00")), (1L, ts("10:00")), (1L, ts("10:10")),
      (2L, ts("10:05"))).toDF("user_id", "ts"), 1, base)
    val preBuf =
      scala.collection.mutable.Set.empty[(Long, Timestamp, Timestamp, Long)]
    val q1 = attach(preBuf)
    try q1.processAllAvailable() finally q1.stop()
    val pre = preBuf.toSet
    assert(pre == Set((5L, ts("09:00"), ts("09:20"), 1L)),
      s"only u5 finalizes before the stop: $pre")
    // chunk 2 lands while the stream is DOWN; the resumed query must
    // recover u1's OPEN session from the checkpointed state and merge
    // the 10:25 event into it (end 10:45), finalize u2, and NOT re-emit
    // u5 (its emission committed with batch 1)
    land(Seq((1L, ts("10:25")), (3L, ts("11:15"))).toDF("user_id", "ts"),
      2, base)
    val postBuf =
      scala.collection.mutable.Set.empty[(Long, Timestamp, Timestamp, Long)]
    val q2 = attach(postBuf)
    try q2.processAllAvailable() finally q2.stop()
    val post = postBuf.toSet
    assert(post == Set(
      (1L, ts("10:00"), ts("10:45"), 3L),
      (2L, ts("10:05"), ts("10:25"), 1L)),
      s"resumed emission must merge across the restart and not " +
        s"re-emit u5: $post")
  }
}
