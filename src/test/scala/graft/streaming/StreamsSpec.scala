package graft.streaming

import graft.TestSpark
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must match the same computation run as a batch —
  * the whole point of reusing DataFrame code for the reference's
  * persistent-workflow TODO. */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val stagingDir = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    Tables(spark, TestSpark.sf0001, "events")
      .repartition(4).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts over the file stream match batch") {
    val streamed = Streams.runToMemory(
      Streams.windowedCounts(Streams.readEvents(spark, stagingDir)),
      "win_counts", org.apache.spark.sql.streaming.OutputMode.Update())
    val batch = Streams.windowedCounts(
      Tables(spark, TestSpark.sf0001, "events").withColumn("dummy", lit(1)))
    // batch "streaming-style" agg over a static frame needs no watermark:
    val batchRes = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val s = streamed.select(col("window.start"), col("event_type"), col("n"))
      .collect().map(_.toString).sorted
    val b = batchRes.select(col("window.start"), col("event_type"), col("n"))
      .collect().map(_.toString).sorted
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("stateful running user totals match batch groupBy") {
    val streamed = Streams.runToMemory(
      Streams.runningUserTotals(Streams.readEvents(spark, stagingDir)).toDF(),
      "user_totals", org.apache.spark.sql.streaming.OutputMode.Update())
    // keep only each user's final state row (max n per user)
    val finalState = streamed.groupBy("user_id")
      .agg(max(struct(col("n"), col("total"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"))
    val batch = Tables(spark, TestSpark.sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val s = finalState.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = batch.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(s.sameElements(b))
  }
}
