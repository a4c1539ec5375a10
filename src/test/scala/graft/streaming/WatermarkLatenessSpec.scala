package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import org.scalatest.funsuite.AnyFunSuite

/** The lossy half of the watermark contract, pinned:
  *
  *  1. a MemoryStream micro-repro of the drop semantics the
  *     q_stream_late oracle models — a row whose window end falls at or
  *     below the late-events watermark is dropped (counted by
  *     `numRowsDroppedByWatermark`) and its already-emitted window is
  *     NOT re-emitted, keeping append output duplicate-free;
  *  2. the q_stream_late replay itself drops a known, deterministic
  *     number of rows at sf0.001 — the guard that keeps the entry
  *     NON-VACUOUS (a staging or delay change that silently stops
  *     producing late rows fails here, not as a still-green oracle over
  *     a lossless replay).
  *
  * The one-batch LAG of the late-events watermark behind the eviction
  * watermark (SPARK-24634 lineage) is pinned by the entry's oracle
  * itself: modeling the filter with the CURRENT batch's watermark
  * (1 PRECEDING over chunk maxima) hash-mismatches, the lagged form
  * (2 PRECEDING) matches.
  */
class WatermarkLatenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("late row below the late-events watermark is dropped, not re-emitted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val agg = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val ck = java.nio.file.Files.createTempDirectory("graft_latespec_ck")
    ck.toFile.deleteOnExit()
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", ck.toString)
      .format("memory").queryName("late_min_spec").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      ms.addData((t("2024-01-01 00:00:01"), "a"), (t("2024-01-01 00:10:00"), "b"))
      q.processAllAvailable() // wm -> 00:09:50; a's window emitted
      ms.addData((t("2024-01-01 00:00:02"), "LATE"), (t("2024-01-01 00:20:00"), "c"))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 1, s"expected exactly the LATE row dropped, got $dropped")
      val out = spark.table("late_min_spec")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      // a and b finalized; c's window is still open; LATE neither appears
      // nor resurrects a's already-emitted window
      assert(out.toSet == Set(
        ("2024-01-01 00:00:00.0", "a", 1L),
        ("2024-01-01 00:10:00.0", "b", 1L)), out.mkString(", "))
    } finally q.stop()
  }

  test("q_stream_late replay drops exactly the oracle-modeled rows at sf0.001") {
    val dir = TestSpark.sf0001
    val landing = graft.queries.StreamingQ.stageFrameChunks(
      graft.core.Tables(spark, dir, "events"),
      Seq(col("ts") + expr("CASE WHEN event_id % 17 = 0 " +
          "THEN INTERVAL 12 DAYS ELSE INTERVAL 0 SECONDS END"),
        col("event_id")), "latespec", 4)
    val stream = spark.readStream.schema(Streams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
    val agg = stream.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
    val ck = java.nio.file.Files.createTempDirectory("graft_latespec_ck2")
    ck.toFile.deleteOnExit()
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", ck.toString)
      .format("memory").queryName("late_entry_spec").start()
    try {
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      // deterministic: the 12-day back-fill pushes 19 of sf0.001's 1000
      // events behind the (lagged) late-events watermark — the number
      // the q_stream_late oracle arithmetic reproduces
      assert(dropped == 19, s"expected 19 watermark-dropped rows, got $dropped")
    } finally q.stop()
  }
}
