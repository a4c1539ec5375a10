package graft.queries

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Structured-Streaming query entry: the SAME windowed aggregation code
  * that runs continuously (watermark + window, Streams.windowedCounts
  * shape) executed over the events table as a file stream and materialized
  * through a memory sink. The DuckDB oracle states the batch equivalence —
  * a streaming aggregation over a bounded source must equal the batch
  * aggregation (10-minute tumbling windows; value sums in exact DECIMAL so
  * batch/stream/oracle partition orders all agree).
  */
object StreamingQ {

  /** Stage the events file into a fresh landing directory and open it as
    * a file stream with `ts` as a proper TimestampType — the reference's
    * IngestSource contract (copy into a landing dir, then pick up:
    * radient/tasks/sources/ingest.py:7-18). Robust to the parquet
    * timestamp encoding, which the data generator has shipped several
    * ways: TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    * TIMESTAMP_NTZ and is cast to the session-zone TimestampType
    * (wall-clock-identical under the UTC session zone); TIMESTAMP(NANOS)
    * arrives as a long under the nanosAsLong session conf and is
    * truncated to micros — the same dtype-guarded normalization
    * graft.core.Tables applies on the batch path. The encoding is
    * detected from a driver-side batch footer read of the single staged
    * file (file streams require a user-supplied schema, so it cannot be
    * inferred stream-side). */
  private def stagedEventStream(s: SparkSession, dir: String, tag: String)
      : DataFrame = {
    val landing = java.nio.file.Files.createTempDirectory(s"graft_stream_$tag")
    val staged = landing.resolve("events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged)
    staged.toFile.deleteOnExit(); landing.toFile.deleteOnExit()
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchTs = s.read.parquet(staged.toString).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", batchTs),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = s.readStream.schema(schema).parquet(landing.toString)
    batchTs match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  val q_stream_windowed = Q(
    "q_stream_windowed",
    (s, dir) => {
      val stream = stagedEventStream(s, dir, "events")
      val agg = stream
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
      // stateful-operator parallelism is pinned at QUERY START and should
      // track state size (#windows × #event_types ≈ thousands), not the
      // session's scan parallelism: every state partition costs per-batch
      // provider init + delta-file I/O in the checkpoint dir. Scoped to
      // this query; the session conf is restored before returning.
      // (Values are exact DECIMAL sums, so partitioning can't change them.)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Streams.runToMemory(agg, "q_stream_windowed_sink", OutputMode.Complete())
        .orderBy(col("window_start"), col("event_type"))
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    },
    Some(s"""
      |SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
      |  count(*) AS n, ${Sql.dsum("value")} AS sum_value
      |FROM events
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type
      |""".stripMargin))

  /** Streaming exact dedup over the event file stream: distinct
    * (user_id, event_type) pairs via `dropDuplicatesWithinWatermark` —
    * first occurrence emits immediately in append mode, duplicate state
    * is evicted as the watermark advances (bounded, unlike plain
    * dropDuplicates). Over a bounded replay nothing evicts mid-run, so
    * the result is exactly the batch DISTINCT — which is what the oracle
    * states. The emitted row per key is whichever arrived first (not
    * deterministic under reordering), so only the KEY columns are
    * projected — the distinct key set is order-independent. */
  val q_stream_dedup = Q(
    "q_stream_dedup",
    (s, dir) => {
      val stream = stagedEventStream(s, dir, "dedup")
        .select(col("user_id"), col("event_type"), col("ts"))
      val dd = graft.streaming.Streams
        .dedupWithinWatermark(stream, Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
      // dedup state partitions sized to key cardinality, like
      // q_stream_windowed (see the note there)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Streams.runToMemory(dd, "q_stream_dedup_sink", OutputMode.Append())
        .orderBy(col("user_id"), col("event_type"))
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    },
    Some("""
      |SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type
      |""".stripMargin))

  /** Stream-stream interval join: purchases joined to the same user's
    * clicks in the preceding 30 minutes — the streaming twin of
    * q_events_attribution's range window, as Structured Streaming's
    * watermarked interval join (both sides buffered, state evicted once
    * the watermark passes the interval bound, so state is
    * 30-minutes-of-stream per side, not the stream). Over a bounded
    * replay nothing evicts mid-run, so the emitted pair set equals the
    * batch join — which is what the oracle states. Integer id pairs →
    * order-independent → hash-checked. */
  val q_stream_join = Q(
    "q_stream_join",
    (s, dir) => {
      val stream = stagedEventStream(s, dir, "join")
      val p = stream.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
        .withWatermark("pts", "30 minutes")
      val c = stream.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
        .withWatermark("cts", "30 minutes")
      val joined = p.join(c,
          expr("pu = cu AND cts >= pts - interval 30 minutes AND cts < pts"))
        .select(col("pid"), col("cid"))
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try Streams.runToMemory(joined, "q_stream_join_sink", OutputMode.Append())
        .orderBy(col("pid"), col("cid"))
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    },
    Some("""
      |SELECT p.event_id AS pid, c.event_id AS cid
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |ORDER BY pid, cid
      |""".stripMargin))

  val all: Seq[Q] = Seq(q_stream_windowed, q_stream_dedup, q_stream_join)
}
