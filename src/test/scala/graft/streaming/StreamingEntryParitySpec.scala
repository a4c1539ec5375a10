package graft.streaming

import graft.TestSpark
import graft.core.Tables
import graft.queries.StreamingQ
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Batch parity for the streaming QUERY ENTRIES on the RAW driver file.
  *
  * The other streaming suites stage events through a Spark re-write,
  * which always lands as TIMESTAMP(MICROS) — so they can't see a
  * timestamp-unit mismatch against the driver-authored parquet (which
  * has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
  * testdata regenerations; round 7's correctness reds were exactly this:
  * a hardcoded nanos→micros `div 1000` compressing time 1000×, which
  * collapses the windowed aggregate and explodes the interval join).
  * This suite runs the actual `StreamingQ` entries on the raw sf0.001
  * file and checks them cell-for-cell against the same computation done
  * in batch via [[Tables]] (whose dtype-guarded read is the unit
  * oracle). Any future unit drift breaks these before the driver's gate.
  */
class StreamingEntryParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("q_stream_windowed equals the batch windowed aggregate on the raw file") {
    val streamed = StreamingQ.q_stream_windowed.run(spark, TestSpark.sf0001)
    val batch = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    assert(collectSorted(streamed) == collectSorted(batch))
    assert(streamed.count() > 1,
      "windowed aggregate collapsed to a handful of windows — timestamp unit drift")
  }

  test("q_stream_join equals the batch interval join on the raw file") {
    val streamed = StreamingQ.q_stream_join.run(spark, TestSpark.sf0001)
    val ev = Tables(spark, TestSpark.sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
    val batch = p.join(c,
        expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"))
      .select(col("pid"), col("cid"))
    assert(collectSorted(streamed) == collectSorted(batch))
  }

  test("q_stream_dedup equals the batch distinct on the raw file") {
    val streamed = StreamingQ.q_stream_dedup.run(spark, TestSpark.sf0001)
    val batch = Tables(spark, TestSpark.sf0001, "events")
      .select(col("user_id"), col("event_type")).distinct()
    assert(collectSorted(streamed) == collectSorted(batch))
  }

  test("q_stream_curate equals the SAME registry operator run in batch") {
    val streamed = StreamingQ.q_stream_curate.run(spark, TestSpark.sf0001)
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val batch = graft.pipeline.Operators
      .make(spark, "transform", "quality_filter")(Seq(docs), Map.empty)
      .withColumn("h", md5(lower(trim(col("text")))))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    assert(collectSorted(streamed) == collectSorted(batch))
    assert(streamed.count() > 0)
  }
}
