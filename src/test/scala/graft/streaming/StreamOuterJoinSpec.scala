package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the watermark semantics `q_stream_join_outer`'s oracle states
  * arithmetically: an unmatched left (purchase) row emits its NULL row
  * exactly when the global watermark — min of the two sides' input
  * watermarks, each max-event-time − delay — has reached its event time
  * (INCLUSIVE at equality), and a row still above the final watermark
  * stays buffered with no verdict when the replay ends. The oracle's
  * `epoch_us(pts) <= w` is this test, stated in SQL.
  */
class StreamOuterJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("outer NULL emission is watermark-gated, inclusive at the boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val df = input.toDF.toDF("event_id", "ts", "user_id", "event_type")
    val p = df.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id".as("pu"), $"ts".as("pts"))
      .withWatermark("pts", "30 minutes")
    val c = df.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"user_id".as("cu"), $"ts".as("cts"))
      .withWatermark("cts", "30 minutes")
    val joined = p.join(c,
        expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"),
        "leftOuter")
      .select($"pid", $"cid")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("outer_join_boundary").start()
    try {
      // b1: A unmatched at 10:00 (will sit exactly ON the watermark),
      // B unmatched at 10:30 (above it), D+E a matched pair, F unmatched
      // strictly below. max(pts) = max(cts) = 10:30 → both input
      // watermarks land at 10:00 after this batch.
      input.addData(
        (1L, ts("10:00"), 1L, "purchase"), // boundary: pts == wm
        (2L, ts("10:30"), 1L, "purchase"), // above wm: stays buffered
        (4L, ts("09:50"), 4L, "purchase"), // strictly below wm
        (3L, ts("10:20"), 3L, "purchase"),
        (60L, ts("10:10"), 3L, "click"), // matches 3 (10:10 ∈ [09:50,10:20))
        (50L, ts("10:30"), 2L, "click")) // no matching purchase user
      q.processAllAvailable()
      // b2: a later click moves only the CLICK watermark (11:00); the
      // global min stays at the purchase side's 10:00, so B keeps waiting.
      input.addData((51L, ts("11:30"), 2L, "click"))
      q.processAllAvailable()

      val rows = spark.table("outer_join_boundary").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((3L, 60L)), s"matched pair missing in $rows")
      assert(rows.contains((4L, -1L)),
        s"NULL row strictly below the watermark missing in $rows")
      assert(rows.contains((1L, -1L)),
        s"boundary row pts == watermark must emit its NULL row (inclusive); got $rows")
      assert(!rows.exists(_._1 == 2L),
        s"row above the final watermark must stay buffered, no verdict; got $rows")
      assert(rows.size == 3, s"unexpected extra rows: $rows")
    } finally q.stop()
  }

  test("full outer: click side evicts a further 30 min behind, strict bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val df = input.toDF.toDF("event_id", "ts", "user_id", "event_type")
    val p = df.filter($"event_type" === "purchase")
      .select($"event_id".as("pid"), $"user_id".as("pu"), $"ts".as("pts"))
      .withWatermark("pts", "30 minutes")
    val c = df.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"user_id".as("cu"), $"ts".as("cts"))
      .withWatermark("cts", "30 minutes")
    val joined = p.join(c,
        expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"),
        "fullOuter")
      .select($"pid", $"cid")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("full_outer_boundary").start()
    try {
      // b1: maxes on both sides at 10:30 → wm = 10:00 after this batch;
      // the click-side eviction bound is a further 30 min back (09:30):
      // a purchase arriving AT the watermark (pts = 10:00) still matches
      // any click with cts ∈ [09:30, 10:00).
      input.addData(
        (90L, ts("09:00"), 9L, "click"), // strictly below 09:30: NULL emits
        (91L, ts("09:30"), 9L, "click"), // exactly AT the bound: must wait
        (92L, ts("09:45"), 9L, "click"), // above the bound: must wait
        (5L, ts("10:00"), 5L, "purchase"), // purchase boundary: pts == wm emits
        (3L, ts("10:20"), 3L, "purchase"),
        (30L, ts("10:10"), 3L, "click"), // matched pair (3, 30)
        (8L, ts("10:30"), 8L, "purchase"), // sets max(pts); above wm
        (70L, ts("10:30"), 7L, "click")) // sets max(cts); above bound
      q.processAllAvailable()
      // b2: advances nothing (both maxes unchanged); runs the eviction
      // pass under the b1-derived watermark.
      input.addData((60L, ts("10:00"), 6L, "click"))
      q.processAllAvailable()

      val rows = spark.table("full_outer_boundary").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((3L, 30L)), s"matched pair missing in $rows")
      assert(rows.contains((5L, -1L)),
        s"purchase at pts == wm must emit its NULL row in $rows")
      assert(rows.contains((-1L, 90L)),
        s"click strictly below wm - 30 min must emit its NULL row in $rows")
      assert(!rows.exists(_._2 == 91L),
        s"click exactly at wm - 30 min could still match a boundary purchase, " +
          s"must stay buffered; got $rows")
      assert(!rows.exists(_._2 == 92L) && !rows.exists(_._2 == 70L) &&
        !rows.exists(_._1 == 8L), s"rows above the bounds leaked: $rows")
      assert(rows.size == 3, s"unexpected extra rows: $rows")
    } finally q.stop()
  }
}
