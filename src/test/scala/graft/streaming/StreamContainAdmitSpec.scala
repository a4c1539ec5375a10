package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** StreamDedup.containAdmit: cross-batch containment admission —
  * restart-resume, first-seen state, within-batch neutrality, mid-window
  * compaction, and the broadcast-pinned per-batch plan (the
  * StreamLshDedupSpec contract applied to the containment tier). */
class StreamContainAdmitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_sct_$tag")
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

  private val tA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  // contiguous token run of tA: every one of its shingles is in tA
  private val subA = "gamma delta epsilon zeta eta theta iota"
  // shares only the leading "alpha beta gamma" run: 2 of 7 shingles
  private val halfA = "alpha beta gamma x1 x2 x3 x4 x5 x6"
  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq(10L -> tA, 11L -> "one two three four five six seven eight"),
    Seq(20L -> subA, // fully contained in 10 -> drop
      21L -> "red green blue cyan magenta yellow",
      22L -> "red green blue cyan magenta yellow"), // same-batch twins: admitted
    Seq(30L -> halfA, // 2/7 contained -> admitted
      31L -> subA), // dup of DROPPED 20 -> still contained in 10 -> drop
    Seq(40L -> "north south east west up down left right"))

  private val wantAdmitted = Map(
    10L -> 1, 11L -> 1, 21L -> 2, 22L -> 2, 30L -> 3, 40L -> 4)

  test("full replay: containment drops subsets of earlier docs, " +
      "first-seen wins, every doc's postings reach state") {
    val landing = tmp("land"); val state = tmp("state"); val ck = tmp("ck")
    val base = System.currentTimeMillis()
    chunks.zipWithIndex.foreach { case (c, i) => land(landing, docs(c), i, base) }
    val q = StreamDedup.containAdmit(stream(landing), state.toString, ck.toString)
    try q.processAllAvailable() finally q.stop()
    assert(admitted(state) == wantAdmitted)
    val stateIds = spark.read.parquet(s"$state/post")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stateIds == chunks.flatten.map(_._1).toSet,
      "dropped docs must still land in posting state (first-seen wins)")
  }

  test("restart-resume with mid-window compaction: admitted set equals " +
      "the uninterrupted run") {
    val landing = tmp("rland"); val state = tmp("rstate"); val ck = tmp("rck")
    val base = System.currentTimeMillis()
    chunks.take(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i, base) }
    val q1 = StreamDedup.containAdmit(stream(landing), state.toString, ck.toString)
    try q1.processAllAvailable() finally q1.stop()
    assert(StreamDedup.compactState(spark, state.toString))
    assert(!java.nio.file.Files.exists(state.resolve("post")))
    assert(java.nio.file.Files.exists(state.resolve("post_base")))
    chunks.drop(2).zipWithIndex.foreach { case (c, i) =>
      land(landing, docs(c), i + 2, base) }
    val q2 = StreamDedup.containAdmit(stream(landing), state.toString, ck.toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(admitted(state) == wantAdmitted)
  }

  test("integer prefix bound: a boundary doc (nsh divisible by 5) whose " +
      "rarest shingle is the one missed is still caught") {
    // P contains 4 of A's 5 shingles — containment exactly 4/5, the
    // threshold boundary. The missing shingle ("a b c") is A's RAREST
    // (prior df 0), so the round-13 float prefix ⌊(1−0.8)·5⌋+1 = 1
    // selected ONLY it: A was never generated as a candidate and a true
    // near-dup was wrongly admitted. The exact integer bound
    // 5 − ⌈4/5·5⌉ + 1 = 2 reaches the first shared shingle.
    val pText = "b c d e f g x y"  // shingles: bcd cde def efg fgx gxy
    val aText = "a b c d e f g"    // shingles: abc bcd cde def efg (4 ⊆ P)
    Seq("prefix", "raw").foreach { strat =>
      val landing = tmp(s"bland$strat"); val state = tmp(s"bstate$strat")
      val ck = tmp(s"bck$strat")
      val base = System.currentTimeMillis()
      land(landing, docs(Seq(1L -> pText)), 0, base)
      land(landing, docs(Seq(2L -> aText)), 1, base)
      val q = StreamDedup.containAdmit(stream(landing), state.toString,
        ck.toString, strategy = strat)
      try q.processAllAvailable() finally q.stop()
      assert(admitted(state) == Map(1L -> 1), s"strategy $strat")
    }
  }

  test("raw, prefix, and auto strategies admit identically across the replay") {
    val results = Seq("raw", "prefix", "auto").map { strat =>
      val landing = tmp(s"eq$strat"); val state = tmp(s"eqst$strat")
      val ck = tmp(s"eqck$strat")
      val base = System.currentTimeMillis()
      chunks.zipWithIndex.foreach { case (c, i) =>
        land(landing, docs(c), i, base) }
      val q = StreamDedup.containAdmit(stream(landing), state.toString,
        ck.toString, strategy = strat)
      try q.processAllAvailable() finally q.stop()
      admitted(state)
    }
    assert(results.toSet.size == 1)
    assert(results.head == wantAdmitted)
  }

  // posting frame exactly as writePostState lands it (hash postings)
  private def postOf(df: DataFrame): DataFrame =
    graft.queries.Dedup.shingleOf(df).select(col("doc_id"),
      explode(transform(col("sh"), s => xxhash64(s))).as("g"))

  test("auto strategy: raw on a benign corpus, prefix once a saturated " +
      "shingle makes the exact fan-out cross the bound") {
    // benign: zero shared shingles between batch and state -> raw rows 0
    val benignState = postOf(docs((1L to 50L).map(i =>
      i -> s"s${i}a s${i}b s${i}c s${i}d s${i}e")))
    val batch = graft.queries.Dedup.shingleOf(docs((100L to 119L).map(i =>
      i -> s"boiler plate header a$i b$i c$i")))
    val benignBatch = graft.queries.Dedup.shingleOf(docs((100L to 119L).map(i =>
      i -> s"n${i}a n${i}b n${i}c n${i}d")))
    assert(StreamDedup.chooseContainStrategy(benignBatch, benignState) == "raw")
    // saturated: the "boiler plate header" shingle sits in all 50 state
    // docs AND all 20 batch docs -> raw join rows >= 50*20 = 1000, while
    // the mandatory posting scan is ~56 rows (50 hot + spillover) —
    // past the 16x bound, so the prefix filter (hot shingles fall
    // outside every rarest-first prefix) takes over
    val hotState = postOf(docs((1L to 50L).map(i =>
      i -> s"boiler plate header u$i v$i w$i")))
    assert(StreamDedup.chooseContainStrategy(batch, hotState) == "prefix")
  }

  test("hot-shingle replay: auto admits exactly what forced raw/prefix " +
      "admit (the decision is purely physical)") {
    // 30% of docs open with the same boilerplate run (the saturated-
    // shingle regime of the round-14 verdict); the rest are unique.
    // Batches are chronological thirds.
    val hotDocs: Seq[(Long, String)] = (1L to 30L).map { i =>
      if (i % 3 == 0L) i -> s"boiler plate header text p$i q$i r$i"
      else i -> s"m${i}a m${i}b m${i}c m${i}d m${i}e m${i}f"
    }
    val parts = hotDocs.grouped(10).toSeq
    val results = Seq("raw", "prefix", "auto").map { strat =>
      val landing = tmp(s"hot$strat"); val state = tmp(s"hotst$strat")
      val ck = tmp(s"hotck$strat")
      val base = System.currentTimeMillis()
      parts.zipWithIndex.foreach { case (c, i) =>
        land(landing, docs(c), i, base) }
      val q = StreamDedup.containAdmit(stream(landing), state.toString,
        ck.toString, strategy = strat)
      try q.processAllAvailable() finally q.stop()
      admitted(state)
    }
    assert(results.toSet.size == 1, s"strategies disagree: $results")
    // every doc admitted: the shared run is 4 tokens -> 2 shingles, far
    // below 4/5 containment of any 6-token doc
    assert(results.head.keySet == hotDocs.map(_._1).toSet)
  }

  test("posting reads prune to the batch's buckets: the compacted base " +
      "is b-partitioned and the scan carries a partition filter") {
    import scala.jdk.CollectionConverters._
    val landing = tmp("pland"); val state = tmp("pstate"); val ck = tmp("pck")
    val base = System.currentTimeMillis()
    land(landing, docs((1L to 80L).map(i =>
      i -> s"u$i v$i w$i x$i y$i z$i q$i r$i")), 0, base)
    val q = StreamDedup.containAdmit(stream(landing), state.toString, ck.toString)
    try q.processAllAvailable() finally q.stop()
    // bucketedBaseMinBytes = 0 forces the partitioned layout the 100 TB
    // regime gets (the default folds this tiny fixture flat — see the
    // compactState size gate)
    assert(StreamDedup.compactState(spark, state.toString,
      bucketedBaseMinBytes = 0L))
    val bucketDirs = java.nio.file.Files.list(state.resolve("post_base"))
      .iterator().asScala.count(_.getFileName.toString.startsWith("b="))
    assert(bucketDirs > 16, s"expected many b= partition dirs, got $bucketDirs")
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a tiny batch hits few buckets; its posting read must carry a
      // partition filter on b and return only those buckets' rows
      val d = graft.queries.Dedup.shingleOf(docs(Seq(999L -> "p q r s t")))
      val post = StreamDedup.postingState(spark, state.toString, 5L, d).get
      val scans = post.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("post_base")) => f
      }
      assert(scans.nonEmpty, "no post_base scan in the pruned read")
      scans.foreach(f => assert(f.partitionFilters.nonEmpty,
        s"post_base scan carries no partition filter:\n${f.treeString}"))
      val full = spark.read.parquet(s"$state/post_base").count()
      assert(post.count() < full,
        "pruned posting read returned the whole base")
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }

  test("double maintenance fold with interleaved restarts: no admitted " +
      "id lost or duplicated") {
    val landing = tmp("dland"); val state = tmp("dstate"); val ck = tmp("dck")
    val base = System.currentTimeMillis()
    def runChunks(from: Int, to: Int): Unit = {
      chunks.slice(from, to).zipWithIndex.foreach { case (c, i) =>
        land(landing, docs(c), from + i, base) }
      val q = StreamDedup.containAdmit(stream(landing), state.toString, ck.toString)
      try q.processAllAvailable() finally q.stop()
    }
    runChunks(0, 2)
    assert(StreamDedup.compactState(spark, state.toString))
    runChunks(2, 3)
    assert(StreamDedup.compactState(spark, state.toString))
    runChunks(3, 4)
    assert(admitted(state) == wantAdmitted)
    // collapse-proof duplicate check (the Map assertion would mask one)
    val ids = StreamDedup.readAdmitted(spark, state.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == ids.distinct.size,
      s"duplicated admitted ids after two folds: $ids")
  }

  test("per-batch plan: posting/shingle state is scanned, never shuffled " +
      "or broadcast raw — df, prefix, and verify broadcast the batch side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{
      BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import graft.queries.Dedup
    val stateDir = tmp("cplanstate").toString
    val corpus = Dedup.shingleOf(docs((1L to 50L).map(i =>
      i -> s"w$i x$i y$i z$i shared tail run here now")))
    corpus.select(col("doc_id"), explode(col("sh")).as("g"))
      .write.mode("overwrite").parquet(s"$stateDir/post")
    corpus.select(col("doc_id"), col("sh"), col("nsh"))
      .write.mode("overwrite").parquet(s"$stateDir/psh")
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = Dedup.shingleOf(docs(Seq(
        100L -> "w9 x9 y9 z9 shared tail run here now",
        101L -> "completely novel words in this page")))
      def isStateScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains("cplanstate"))
        case _ => false
      }
      def exposed(p: SparkPlan): Boolean = p match {
        case _: BroadcastHashJoinExec => false
        case s if isStateScan(s) => true
        case other => other.children.exists(exposed)
      }
      def pinned(m: org.apache.spark.sql.DataFrame, minBhj: Int): Unit = {
        val plan = m.queryExecution.executedPlan
        plan.collect { case s: ShuffleExchangeExec => s }.foreach(s =>
          assert(!exposed(s.child),
            s"raw state rows enter a shuffle:\n${s.treeString}"))
        plan.collect { case b: BroadcastExchangeExec => b }.foreach(b =>
          assert(!exposed(b.child),
            s"raw corpus state is broadcast:\n${b.treeString}"))
        assert(plan.collect { case j: BroadcastHashJoinExec => j }.size >= minBhj)
      }
      pinned(StreamDedup.containMatched(d,
        spark.read.parquet(s"$stateDir/post"),
        spark.read.parquet(s"$stateDir/psh"), tauNum = 4, tauDen = 5), 3)
      // the raw strategy's plan holds the same contract with ONE posting
      // scan: post joins broadcast batch postings, sh joins broadcast
      // candidates — state never shuffled or broadcast raw
      pinned(StreamDedup.containMatchedRaw(d,
        spark.read.parquet(s"$stateDir/post"),
        spark.read.parquet(s"$stateDir/psh"), tauNum = 4, tauDen = 5), 3)
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }
}
