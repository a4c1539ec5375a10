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
}
