package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** StreamDedup.ladderAdmit: the four admission tiers composed in one
  * foreachBatch over ONE shared state family — per-tier drops, the
  * intersection semantics, single-copy shingle state, restart-resume
  * with mid-window compaction. */
class StreamLadderAdmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sla_$tag")
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
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("batch").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private val tA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  // contiguous run of tA: all 5 shingles ⊆ tA → containment drop
  private val subA = "gamma delta epsilon zeta eta theta iota"
  // tA's full 10-shingle run diluted with 20 novel tokens: containment
  // 10/30 and Jaccard 10/30 both BELOW their thresholds, but the tA run
  // yields ≥2 shared winnow fingerprints (two disjoint 4-windows inside
  // the run can never share a min position) → winnow-ONLY drop
  private val dilute = tA + " " + (1 to 20).map(i => s"n$i").mkString(" ")
  // one token changed: 9/10 shingles ⊆ tA → containment drop (and an
  // LSH near-dup besides)
  private val nearA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
  private val t22 = "red green blue cyan magenta yellow"

  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq(10L -> tA, 11L -> "one two three four five six seven eight"),
    Seq(20L -> tA, // exact dup of 10 → exact-tier drop
      21L -> subA, // contained in 10 → containment drop
      22L -> t22),
    Seq(30L -> nearA, // 9/10 contained → drop
      31L -> "paris london tokyo berlin madrid rome",
      32L -> dilute), // winnow-tier drop
    Seq(40L -> "north south east west up down left right",
      41L -> t22)) // exact dup of 22 → exact-tier drop

  private val wantAdmitted =
    Map(10L -> 1, 11L -> 1, 22L -> 2, 31L -> 3, 40L -> 4)

  test("full replay: each tier drops its own shape, admitted set is the " +
      "intersection, and every doc reaches every state kind") {
    val landing = tmp("land"); val state = tmp("state"); val ck = tmp("ck")
    val base = System.currentTimeMillis()
    chunks.zipWithIndex.foreach { case (c, i) => land(landing, docs(c), i, base) }
    val q = StreamDedup.ladderAdmit(stream(landing), state.toString, ck.toString)
    try q.processAllAvailable() finally q.stop()
    assert(admitted(state) == wantAdmitted)
    // first-seen wins: dropped docs still land in state, in EVERY kind
    val allIds = chunks.flatten.map(_._1).toSet
    Seq("hashes", "bands", "sh", "post").foreach { kind =>
      val ids = spark.read.parquet(s"$state/$kind")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(ids == allIds, s"state kind $kind is missing docs")
    }
  }

  test("single-copy shingle state: one sh kind serves both the LSH and " +
      "containment verifies — no duplicate shingle dir exists") {
    val landing = tmp("sland"); val state = tmp("sstate"); val ck = tmp("sck")
    val base = System.currentTimeMillis()
    chunks.zipWithIndex.foreach { case (c, i) => land(landing, docs(c), i, base) }
    val q = StreamDedup.ladderAdmit(stream(landing), state.toString, ck.toString)
    try q.processAllAvailable() finally q.stop()
    val kinds = java.nio.file.Files.list(state).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(kinds == Set("hashes", "bands", "sh", "fps", "post", "admitted"),
      s"unexpected state layout: $kinds")
    // the sh table holds each doc's shingles exactly once
    val sh = spark.read.parquet(s"$state/sh")
    assert(sh.count() == chunks.flatten.size.toLong)
  }

  test("restart-resume with mid-window compaction: admitted set equals " +
      "the uninterrupted run") {
    val landing = tmp("rland"); val state = tmp("rstate"); val ck = tmp("rck")
    val base = System.currentTimeMillis()
    chunks.take(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i, base) }
    val q1 = StreamDedup.ladderAdmit(stream(landing), state.toString, ck.toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(StreamDedup.compactState(spark, state.toString))
    Seq("hashes", "bands", "sh", "fps", "post").foreach { kind =>
      assert(!java.nio.file.Files.exists(state.resolve(kind)))
      assert(java.nio.file.Files.exists(state.resolve(s"${kind}_base")))
    }
    chunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i + 2, base) }
    val q2 = StreamDedup.ladderAdmit(stream(landing), state.toString, ck.toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(admitted(state) == wantAdmitted)
  }
}
