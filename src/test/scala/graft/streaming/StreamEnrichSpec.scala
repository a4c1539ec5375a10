package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream,
  StreamingQueryWrapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `q_stream_enrich`'s scale claim: a stream-static dimension join
  * plans as ONE BroadcastHashJoin per micro-batch with the stream side
  * never entering a shuffle — the dim is the only thing that moves, so
  * event volume scales the scan, not the network.
  */
class StreamEnrichSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("per-batch plan: dim broadcast, stream side unshuffled; rows enrich") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val stream = input.toDF.toDF("event_id", "user_id", "ts")
    val dim = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val joined = stream.join(broadcast(dim), $"user_id" === $"c_custkey")
      .select($"event_id", $"c_mktsegment")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich_plan").start()
    try {
      input.addData((10L, 1L, ts("10:00")), (11L, 2L, ts("10:01")),
        (12L, 9L, ts("10:02"))) // user 9 has no dim row → dropped (inner)
      q.processAllAvailable()
      val rows = spark.table("enrich_plan").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((10L, "AUTOMOBILE"), (11L, "BUILDING")),
        s"enriched rows wrong: $rows")
      // the micro-batch's own execution (the foreachBatch frame would
      // only show the already-computed result as an ExistingRDD scan);
      // stateless streaming plans run under AQE, so unwrap its stages
      val plan = q.asInstanceOf[StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
        case s: QueryStageExec => p +: flatten(s.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val nodes = flatten(plan)
      val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.size == 1, s"expected one broadcast hash join:\n$plan")
      assert(nodes.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"stream-static enrichment must not shuffle:\n$plan")
    } finally q.stop()
  }
}
