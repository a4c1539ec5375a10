package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface — the "persistent workflow" the reference
  * left as a TODO (radient/orchestrate/workflow.py:55-56): the same
  * DataFrame code runs over a file-arrival stream, plus watermarked
  * windowed aggregation and custom keyed state.
  *
  * Scale shape: file-arrival sources scale to object-store listings;
  * windowed aggregates keep state bounded by the watermark; keyed state
  * shuffles once on user_id and lives in the state store.
  */
object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-arrival ingest of events-shaped parquet (IngestSource parity,
    * radient/tasks/sources/ingest.py — continuous instead of one-shot). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked sliding-window aggregate: counts + value sums per
    * event_type per 10-minute window. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStat(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via flatMapGroupsWithState: running per-user
    * totals (the mapGroupsWithState path from SURVEY.md §1.5), with an
    * event-time idle TTL so state stays BOUNDED on an unbounded key
    * space: a key idle past `idleTtlMs` (measured against the watermark)
    * emits its final stat once more (flush-on-evict) and its state is
    * removed. A key that reappears later restarts from zero —
    * StreamsTtlSpec pins exactly that behavior. Without the TTL the
    * state store grows monotonically with distinct user_ids, which at
    * 100 TB of events is an executor-memory death sentence. */
  def runningUserTotals(events: DataFrame,
      watermarkDelay: String = "30 minutes",
      idleTtlMs: Long = 30L * 60 * 1000): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStat, UserStat](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStat]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(last)
          } else {
            val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
            var n = prev.n; var total = prev.total
            var maxTs = Long.MinValue
            rows.foreach { e =>
              n += 1; total += e.value
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            val next = UserStat(uid, n, total)
            state.update(next)
            // timeout must sit strictly above the current watermark or
            // Spark rejects it (a just-on-time event can trail it by up
            // to the allowed lateness)
            state.setTimeoutTimestamp(
              math.max(maxTs + idleTtlMs, state.getCurrentWatermarkMs() + 1))
            Iterator(next)
          }
      }
  }

  /** Streaming exact dedup with BOUNDED state: first occurrence per key
    * emits immediately (append), duplicates arriving within the watermark
    * delay are dropped, and key state is EVICTED once the watermark
    * passes — the streaming twin of the batch hash-groupBy dedup, and the
    * state-bounded form of plain `dropDuplicates` (which would retain
    * every key ever seen; on an unbounded corpus that is the same
    * executor-memory death sentence as a TTL-less keyed state). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      tsCol: String = "ts", watermarkDelay: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Number of micro-batches the last [[runToMemory]] run under each
    * sink name executed — MultiBatchReplaySpec reads this to assert the
    * staged replays really cross batch boundaries (a single-batch replay
    * can never exercise watermark advancement or state carry-over). */
  private val executedBatches =
    new scala.collection.concurrent.TrieMap[String, Long]
  private[graft] def batchesExecuted(name: String): Option[Long] =
    executedBatches.get(name)

  /** Total state-store rows at the end of the last [[runToMemory]] run
    * per sink name (sum over stateful operators) — the MEASURED form of
    * each entry's bounded-state claim (e.g. the streaming domain cap's
    * "one heap buffer per source": state rows must equal |sources|,
    * never the document count). */
  private val stateRowCounts =
    new scala.collection.concurrent.TrieMap[String, Long]
  private[graft] def stateRows(name: String): Option[Long] =
    stateRowCounts.get(name)

  /** Run a streaming frame to completion against a memory sink and return
    * the materialized result (test/local harness). The throwaway
    * checkpoint goes to tmpfs when the host has one: the HDFS-backed
    * state store fsyncs a delta file per state partition per micro-batch
    * plus offset/commit logs, and on a disk-backed /tmp those syncs —
    * not the joins — dominate a multi-batch replay. A real deployment
    * puts the checkpoint on durable storage for recovery; this harness
    * run is discarded on stop, so durability buys nothing. */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Update()): DataFrame = {
    val ck = graft.core.Scratch.tempDir(s"graft_ck_$name")
    val q = df.writeStream.outputMode(mode)
      .option("checkpointLocation", ck.toString)
      .format("memory").queryName(name).start()
    var completed = false
    try {
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        executedBatches.put(name, p.batchId + 1)
        stateRowCounts.put(name,
          p.stateOperators.map(_.numRowsTotal).sum)
      }
      completed = true
    } finally {
      q.stop()
      if (completed) {
        // the run is complete and the sink is in memory — the checkpoint
        // has no further use; delete it now rather than letting finished
        // runs accumulate in tmpfs
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(ck)
          try walk.iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close() // Files.walk holds open directory handles
        } catch { case _: java.io.IOException => () }
      } else {
        // FAILED run: the offset/commit/state logs are exactly the
        // debugging evidence — keep them and say where they are
        System.err.println(
          s"[graft] streaming query '$name' failed; checkpoint kept at $ck")
      }
    }
    df.sparkSession.table(name)
  }
}
