package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-vs-batch equivalence FUZZ (round 11): random
  * (window, watermark-delay, lateness-pattern, chunk-count) configs
  * replayed BOTH ways — a multi-micro-batch append-mode windowed count
  * against a pure-Scala batch model of Spark's documented watermark
  * semantics:
  *
  *  - the late-row filter in batch b uses the watermark computed from
  *    event times through batch b−2 (it LAGS eviction by one batch —
  *    the round-10 empirical pin from q_stream_late's oracle);
  *  - the watermark is the max observed event time truncated to
  *    milliseconds minus the delay;
  *  - append mode emits exactly the windows whose end ≤ the final
  *    watermark (the post-data no-data trigger advances it over the
  *    last chunk).
  *
  * Each seed perturbs every knob at once, so one green sweep pins the
  * semantics across window/delay/lateness combinations nobody
  * hand-wrote — the streaming counterpart of FuzzRelationalSpec.
  * Lateness is planted the q_stream_late way: chunks are ordered by a
  * SHIFTED arrival time while rows keep their original event time, so
  * late-mod rows arrive chunks later than their event time says.
  */
object FuzzStreamingSpec {
  private final case class Ev(id: Long, us: Long, adjUs: Long, tp: String)
}

class FuzzStreamingSpec extends AnyFunSuite {
  import FuzzStreamingSpec.Ev
  lazy val spark = TestSpark.spark

  test("random watermark/window/lateness configs: streaming append equals the batch watermark model") {
    val events = graft.core.Tables(spark, TestSpark.sf0001, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .cache()
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val windowMin = Seq(5, 10, 20)(rnd.nextInt(3))
      val delayMin = Seq(10, 30, 60)(rnd.nextInt(3))
      val lateMod = Seq(7, 13, 17)(rnd.nextInt(3))
      val lateHours = Seq(2, 24, 288)(rnd.nextInt(3))
      val numFiles = 3 + rnd.nextInt(3)
      val cfg = s"seed=$seed window=${windowMin}m delay=${delayMin}m " +
        s"lateMod=$lateMod lateH=$lateHours files=$numFiles"

      val adjExpr = col("ts") + expr(s"CASE WHEN event_id % $lateMod = 0 " +
        s"THEN INTERVAL $lateHours HOURS ELSE INTERVAL 0 SECONDS END")
      val landing = graft.queries.StreamingQ.stageFrameChunks(
        events, Seq(adjExpr, col("event_id")), s"fuzzcfg$seed", numFiles)

      // streaming side: one chunk per micro-batch, append-mode windowed
      // count under the config's watermark
      val st = spark.readStream
        .schema(spark.read.parquet(landing.toString).schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val agg = st.withWatermark("ts", s"$delayMin minutes")
        .groupBy(window(col("ts"), s"$windowMin minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("ws"),
          col("event_type"), col("n"))
      val got = Streams.runToMemory(agg, s"fuzz_stream_cfg$seed",
          OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet

      // batch model (pure Scala over the same rows)
      val data = events.select(col("event_id"), expr("unix_micros(ts)"),
          col("event_type")).collect()
        .map { r =>
          val id = r.getLong(0); val us = r.getLong(1)
          val adj = us +
            (if (id % lateMod == 0) lateHours * 3600L * 1000000L else 0L)
          Ev(id, us, adj, r.getString(2))
        }
      val sorted = data.sortBy(e => (e.adjUs, e.id))
      val total = sorted.length
      val qsz = total / numFiles; val rem = total % numFiles
      val chunks = (0 until numFiles).map { i =>
        val start = i * qsz + math.min(i, rem)
        sorted.slice(start, start + qsz + (if (i < rem) 1 else 0))
      }
      val winUs = windowMin * 60L * 1000000L
      val delayMs = delayMin * 60000L
      def wEnd(us: Long) = Math.floorDiv(us, winUs) * winUs + winUs
      val chunkMax = chunks.map(_.map(_.us).max)
      def filterWm(i: Int): Option[Long] =
        if (i < 2) None
        else Some((chunkMax.slice(0, i - 1).max / 1000 - delayMs) * 1000)
      val kept = chunks.zipWithIndex.flatMap { case (ch, i) =>
        ch.filter(e => filterWm(i).forall(wm => wEnd(e.us) > wm))
      }
      val finalWm = (chunkMax.max / 1000 - delayMs) * 1000
      val want = kept.filter(e => wEnd(e.us) <= finalWm)
        .groupBy(e => (wEnd(e.us) - winUs, e.tp))
        .map { case ((ws, tp), es) => (ws, tp, es.size.toLong) }
        .toSet
      assert(want.nonEmpty, s"vacuous config (no emitted windows): $cfg")
      assert(got == want,
        s"streaming/batch divergence at $cfg\nonly-streaming=${got -- want}" +
          s"\nonly-model=${want -- got}")
    }
  }

  test("restart mid-replay at a random chunk boundary: the resumed " +
      "stream still equals the batch watermark model, exactly once") {
    // round 12: same random configs, but the query STOPS after a random
    // number of chunks and RESUMES from its checkpoint once the rest
    // land, and the file sink's metadata log must keep replayed batches
    // exactly-once (the model is a plain set+size compare over the
    // sink, so a duplicated window row fails the size check).
    //
    // Restart SEMANTIC pinned here (measured, then modeled): a restart
    // TIGHTENS the late-row filter for exactly the first resumed
    // chunk. processAllAvailable's post-data no-data trigger at
    // shutdown advances the committed watermark over the final
    // processed chunk (that is how final windows get emitted), so the
    // resumed query's first data batch filters with the watermark
    // through chunk restartAt−1 — one chunk FRESHER than the
    // uninterrupted lag-by-one (through restartAt−2). Later chunks are
    // back on the normal lag (the no-data batch carries no event-time
    // stats of its own). A late row landing in the restart chunk whose
    // window closed between those two watermarks is dropped where an
    // uninterrupted run would still have counted it — correct per the
    // watermark contract (a watermark only promises an upper bound on
    // admitted lateness), and the model below encodes it exactly.
    import scala.jdk.CollectionConverters._
    val events = graft.core.Tables(spark, TestSpark.sf0001, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .cache()
    def tmp(tag: String): java.nio.file.Path = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_fuzzrr_$tag")
      d.toFile.deleteOnExit()
      d
    }
    // seeds 6-9: one restart at a random boundary; seeds 10-11
    // (round 13): TWO restarts at random boundaries — each resume
    // tightens the late filter for its own first chunk, and the two
    // tightenings must compose without double-emitting any window
    for (seed <- 6 until 12) {
      val rnd = new scala.util.Random(seed)
      val windowMin = Seq(5, 10, 20)(rnd.nextInt(3))
      val delayMin = Seq(10, 30, 60)(rnd.nextInt(3))
      val lateMod = Seq(7, 13, 17)(rnd.nextInt(3))
      val lateHours = Seq(2, 24, 288)(rnd.nextInt(3))
      val numFiles = 3 + rnd.nextInt(3)
      val restarts: Seq[Int] =
        if (seed < 10) Seq(1 + rnd.nextInt(numFiles - 1))
        else {
          val r1 = 1 + rnd.nextInt(numFiles - 2)
          val r2 = r1 + 1 + rnd.nextInt(numFiles - 1 - r1)
          Seq(r1, r2)
        }
      val cfg = s"seed=$seed window=${windowMin}m delay=${delayMin}m " +
        s"lateMod=$lateMod lateH=$lateHours files=$numFiles " +
        s"restart@${restarts.mkString(",")}"

      val adjExpr = col("ts") + expr(s"CASE WHEN event_id % $lateMod = 0 " +
        s"THEN INTERVAL $lateHours HOURS ELSE INTERVAL 0 SECONDS END")
      val staged = graft.queries.StreamingQ.stageFrameChunks(
        events, Seq(adjExpr, col("event_id")), s"fuzzrr$seed", numFiles)
      val chunkFiles = java.nio.file.Files.list(staged).iterator().asScala
        .toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      val landing = tmp(s"land$seed"); val ck = tmp(s"ck$seed")
      val out = tmp(s"out$seed")
      def land(i: Int): Unit = {
        val dst = landing.resolve(chunkFiles(i).getFileName.toString)
        java.nio.file.Files.copy(chunkFiles(i), dst)
        dst.toFile.setLastModified(chunkFiles(i).toFile.lastModified())
        ()
      }
      def start() = {
        val st = spark.readStream
          .schema(spark.read.parquet(staged.toString).schema)
          .option("maxFilesPerTrigger", "1").parquet(landing.toString)
        st.withWatermark("ts", s"$delayMin minutes")
          .groupBy(window(col("ts"), s"$windowMin minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("ws"),
            col("event_type"), col("n"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", ck.toString)
          .format("parquet").option("path", out.toString).start()
      }
      // land + run in phases split at every restart boundary
      val phases = (0 +: restarts) .zip(restarts :+ numFiles)
      phases.foreach { case (from, until) =>
        (from until until).foreach(land)
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }

      val rows = spark.read.parquet(out.toString).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val got = rows.toSet
      assert(rows.length == got.size, s"duplicate emissions after restart: $cfg")

      // the same pure-Scala model as the uninterrupted test
      val data = events.select(col("event_id"), expr("unix_micros(ts)"),
          col("event_type")).collect()
        .map { r =>
          val id = r.getLong(0); val us = r.getLong(1)
          val adj = us +
            (if (id % lateMod == 0) lateHours * 3600L * 1000000L else 0L)
          Ev(id, us, adj, r.getString(2))
        }
      val sorted = data.sortBy(e => (e.adjUs, e.id))
      val total = sorted.length
      val qsz = total / numFiles; val rem = total % numFiles
      val chunks = (0 until numFiles).map { i =>
        val start = i * qsz + math.min(i, rem)
        sorted.slice(start, start + qsz + (if (i < rem) 1 else 0))
      }
      val winUs = windowMin * 60L * 1000000L
      val delayMs = delayMin * 60000L
      def wEnd(us: Long) = Math.floorDiv(us, winUs) * winUs + winUs
      val chunkMax = chunks.map(_.map(_.us).max)
      // restart-aware lag: chunk i's filter normally sees event times
      // through chunk i−2; the FIRST chunk resumed after a restart at r
      // sees through r−1 — the shutdown no-data trigger already
      // advanced the committed watermark over every processed chunk.
      // With several restarts, each applies its own floor (max over the
      // boundaries at or before i; i−2 dominates again from r+1 on).
      def filterWm(i: Int): Option[Long] = {
        val hi = ((i - 2) +: restarts.filter(_ <= i).map(_ - 1)).max
        if (hi < 0) None
        else Some((chunkMax.slice(0, hi + 1).max / 1000 - delayMs) * 1000)
      }
      val kept = chunks.zipWithIndex.flatMap { case (ch, i) =>
        ch.filter(e => filterWm(i).forall(wm => wEnd(e.us) > wm))
      }
      val finalWm = (chunkMax.max / 1000 - delayMs) * 1000
      val want = kept.filter(e => wEnd(e.us) <= finalWm)
        .groupBy(e => (wEnd(e.us) - winUs, e.tp))
        .map { case ((ws, tp), es) => (ws, tp, es.size.toLong) }
        .toSet
      assert(want.nonEmpty, s"vacuous config (no emitted windows): $cfg")
      assert(got == want,
        s"restart-resume divergence at $cfg\nonly-streaming=${got -- want}" +
          s"\nonly-model=${want -- got}")
    }
  }
}
