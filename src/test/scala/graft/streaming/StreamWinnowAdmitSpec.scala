package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** StreamDedup.winnowAdmit: cross-batch partial-overlap admission —
  * restart-resume through the checkpointed offset log, first-seen state
  * (a dup of a DROPPED doc is still a dup), within-batch neutrality,
  * state compaction mid-stream, and the broadcast-pinned per-batch plan
  * (the StreamLshDedupSpec contract applied to the winnow tier). */
class StreamWinnowAdmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_swn_$tag")
    d.toFile.deleteOnExit()
    d
  }

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def land(landing: java.nio.file.Path, df: DataFrame,
      i: Int, base: Long): Unit = {
    val staging = tmp(s"stage$i")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
    val dest = landing.resolve(f"chunk$i%03d.parquet")
    java.nio.file.Files.move(part, dest)
    dest.toFile.deleteOnExit()
    dest.toFile.setLastModified(base + i * 2000L)
    ()
  }

  private def stream(landing: java.nio.file.Path): DataFrame =
    spark.readStream.schema(docs(Seq((0L, "x y z"))).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)

  private def admitted(stateRoot: java.nio.file.Path): Map[Long, Int] =
    StreamDedup.readAdmitted(spark, stateRoot.toString)
      .select(col("doc_id"), col("batch").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  // 12-token texts (≥ 9 fingerprint windows each); 20/40 are full
  // copies of batch-1 texts (share every fp), 30 quotes an 8-token run
  // of 11 inside fresh padding, 21/22 duplicate each other WITHIN a
  // batch (both admitted — dedup is strictly against earlier batches)
  private val tA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val tB =
    "one two three four five six seven eight nine ten eleven twelve"
  private val tC =
    "red green blue cyan magenta yellow pink gray teal navy olive plum"
  private val quoteB =
    "intro one two three four five six seven eight nine ten eleven outro"
  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq(10L -> tA, 11L -> tB),
    Seq(20L -> tA, // full quote of 10 -> drop
      21L -> tC, 22L -> tC), // same-batch twins: both admitted
    Seq(30L -> quoteB, // heavy quote of 11 -> drop iff ≥2 shared fps
      31L -> "north south east west up down left right front back mid end"),
    Seq(40L -> tA, // dup of DROPPED 20 -> still a dup (first-seen)
      41L -> "zinc iron gold lead tin copper nickel cobalt neon argon xenon krypton"))

  /** The batch-side ground truth for the quoteB → tB overlap, computed
    * with the same winnowFps kernel: the spec must not hand-assume how
    * many window-min fps an 8-token shared run yields. */
  private lazy val quoteSharedFps: Long = {
    val f = graft.queries.TextAnalysis.winnowFps(
      docs(Seq(1L -> tB, 2L -> quoteB)))
    f.groupBy("fp").count().filter(col("count") === 2).count()
  }

  private lazy val wantAdmitted: Map[Long, Int] = {
    val base = Map(10L -> 1, 11L -> 1, 21L -> 2, 22L -> 2, 31L -> 3, 41L -> 4)
    if (quoteSharedFps >= 2L) base else base + (30L -> 3)
  }

  test("full replay: first-seen admission, same-batch twins both " +
      "admitted, every doc's fps reach state") {
    assert(quoteSharedFps >= 2L,
      s"fixture too weak: quoteB shares only $quoteSharedFps fps with tB")
    val landing = tmp("land"); val state = tmp("state"); val ck = tmp("ck")
    val base = System.currentTimeMillis()
    chunks.zipWithIndex.foreach { case (c, i) => land(landing, docs(c), i, base) }
    val q = StreamDedup.winnowAdmit(stream(landing), state.toString, ck.toString)
    try q.processAllAvailable() finally q.stop()
    assert(admitted(state) == wantAdmitted)
    val stateIds = spark.read.parquet(s"$state/fps")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stateIds == chunks.flatten.map(_._1).toSet,
      "dropped docs must still land in fp state (first-seen wins)")
  }

  test("restart-resume with mid-window state compaction: admitted set " +
      "equals the uninterrupted run") {
    val landing = tmp("rland"); val state = tmp("rstate"); val ck = tmp("rck")
    val base = System.currentTimeMillis()
    chunks.take(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i, base) }
    val q1 = StreamDedup.winnowAdmit(stream(landing), state.toString, ck.toString)
    try q1.processAllAvailable() finally q1.stop()
    // maintenance window: fold fps batch dirs into fps_base
    assert(StreamDedup.compactState(spark, state.toString))
    assert(!java.nio.file.Files.exists(state.resolve("fps")))
    assert(java.nio.file.Files.exists(state.resolve("fps_base")))
    chunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i + 2, base) }
    val q2 = StreamDedup.winnowAdmit(stream(landing), state.toString, ck.toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(admitted(state) == wantAdmitted)
  }

  test("per-batch plan: fp state is scanned, never shuffled or broadcast " +
      "raw — df cut and candidate join broadcast the batch side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val stateDir = tmp("wplanstate").toString
    graft.queries.TextAnalysis.winnowFps(
        docs((1L to 40L).map(i => i -> s"w$i x$i y$i z$i a$i b$i c$i d$i e$i")))
      .write.mode("overwrite").parquet(s"$stateDir/fps")
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bfps = graft.queries.TextAnalysis.winnowFps(docs(Seq(
        100L -> "w7 x7 y7 z7 a7 b7 c7 d7 e7",
        101L -> "fresh tokens entirely new words here again more pad")))
      val m = StreamDedup.winnowMatched(bfps,
        spark.read.parquet(s"$stateDir/fps"), maxDf = 50L, minShared = 2L)
      val plan = m.queryExecution.executedPlan
      def isStateScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("wplanstate"))
        case _ => false
      }
      def exposed(p: SparkPlan): Boolean = p match {
        case _: BroadcastHashJoinExec => false
        case s if isStateScan(s) => true
        case other => other.children.exists(exposed)
      }
      plan.collect { case s: ShuffleExchangeExec => s }.foreach(s =>
        assert(!exposed(s.child),
          s"raw fp state enters a shuffle:\n${s.treeString}"))
      plan.collect { case b: BroadcastExchangeExec => b }.foreach(b =>
        assert(!exposed(b.child),
          s"raw fp state is broadcast:\n${b.treeString}"))
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }
}
