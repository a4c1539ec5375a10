package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Idle-key eviction for the keyed running-totals state: a user idle past
  * the event-time TTL is flushed and removed from the state store, and a
  * later event for that user starts a FRESH count — the observable proof
  * that the state row was dropped rather than kept forever.
  */
class StreamsTtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("idle user state is evicted by the event-time TTL and restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val totals = Streams.runningUserTotals(
      input.toDF.toDF("user_id", "ts", "value"),
      watermarkDelay = "1 minute", idleTtlMs = 10L * 60 * 1000)
    val q = totals.toDF.writeStream.outputMode("update")
      .format("memory").queryName("ttl_totals").start()
    try {
      // b1: both users live; u2's timeout lands at 10:10
      input.addData((1L, ts("10:00"), 1.0), (2L, ts("10:00"), 5.0))
      q.processAllAvailable()
      // b2: only u1 — watermark advances to 11:59, past u2's timeout
      input.addData((1L, ts("12:00"), 1.0))
      q.processAllAvailable()
      // b3: timeouts are evaluated against the PREVIOUS batch's watermark,
      // so this batch evicts u2 (flush-on-evict emits its last stat)
      input.addData((1L, ts("12:01"), 1.0))
      q.processAllAvailable()
      // b4: u2 reappears — state must restart from zero, not resume
      input.addData((2L, ts("12:02"), 7.0))
      q.processAllAvailable()

      val rows = spark.table("ttl_totals")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // fresh state after eviction: n=1/total=7.0, NOT n=2/total=12.0
      assert(rows.contains((2L, 1L, 7.0)), s"missing restarted stat in $rows")
      assert(!rows.contains((2L, 2L, 12.0)),
        s"user 2 state survived the TTL in $rows")
      // flush-on-evict: u2's pre-eviction stat appears twice (update + flush)
      assert(rows.count(_ == (2L, 1L, 5.0)) == 2,
        s"expected eviction flush of (2,1,5.0) in $rows")
    } finally q.stop()
  }

  test("state store row count shrinks after eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val totals = Streams.runningUserTotals(
      input.toDF.toDF("user_id", "ts", "value"),
      watermarkDelay = "1 minute", idleTtlMs = 10L * 60 * 1000)
    val q = totals.toDF.writeStream.outputMode("update")
      .format("memory").queryName("ttl_state_rows").start()
    try {
      input.addData((1L, ts("10:00"), 1.0), (2L, ts("10:00"), 5.0),
        (3L, ts("10:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("12:00"), 1.0))
      q.processAllAvailable()
      input.addData((1L, ts("12:01"), 1.0))
      q.processAllAvailable()
      val lastState = q.recentProgress.flatMap(_.stateOperators).lastOption
      assert(lastState.exists(_.numRowsTotal == 1L),
        s"expected only u1's state row, got ${lastState.map(_.numRowsTotal)}")
    } finally q.stop()
  }
}
