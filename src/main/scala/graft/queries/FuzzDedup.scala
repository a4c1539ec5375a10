package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized differential fuzzing of the streaming dedup ADMISSION
  * state machine (round 15 — the flagship stateful operator family gets
  * the same treatment the windowed-agg and interval-join machines got in
  * [[FuzzStream]]): a seeded generator draws an admission tier
  * (MinHash-LSH / winnow overlap / shingle containment / the composed
  * 4-tier ladder), its thresholds, a chunk count, and an optional
  * corpus-narrowing residue filter, then executes the plan THREE ways —
  * as a chronological multi-micro-batch replay through
  * [[graft.streaming.StreamDedup]] (state crossing batch boundaries,
  * bucket-pruned posting reads, the auto/raw/prefix strategy axis), as
  * an INDEPENDENT batch-window formulation in Spark (ntile chunks +
  * earlier-chunk window joins — no state machinery, no foreachBatch, a
  * genuinely different composition of the same kernels), and (for the
  * fixed [[driverSeeds]]) as ANSI SQL in DuckDB. All three must agree
  * row-for-row, admitted batch number included.
  *
  * The hand-written `q_stream_dedup_*` entries pin ONE point of the
  * parameter space each (verifyT 0.7, maxDf 50, minShared 2, τ 4/5,
  * 4 chunks, the full corpus); the axes none of them vary are exactly
  * where threshold-boundary and batch-boundary bugs live: a chunk count
  * that puts near-dup pairs in the SAME batch (must NOT suppress), a τ
  * like 1/2 where the integer prefix bound ⌈n·τ⌉ rounds differently
  * than 4/5, a df cap low enough to cut real candidates, a verify
  * threshold at an exact rational jaccard value (both engines compute
  * the same IEEE double from the same integers, so `>=` agrees — the
  * same discipline as the hand-written entries' 0.7).
  *
  * Draw space per seed (each draw independent):
  *  - corpus: full, or `doc_id % p = r` for p ∈ {2, 3} (varies the
  *    near-dup topology — replicas of a doc may fall out, turning a
  *    suppressed doc into an admitted one);
  *  - chunks ∈ {2, 4, 8} equal-count arrival-ordered micro-batches;
  *  - tier ∈ {lsh, winnow, containment, ladder};
  *  - LSH verify threshold ∈ {0.5, 0.6, 0.7, 0.8};
  *  - winnow prior-df cap ∈ {5, 20, 50} × min shared fps ∈ {1, 2, 3};
  *  - containment τ ∈ {1/2, 2/3, 3/4, 4/5, 9/10} (exact rationals —
  *    integer cross-multiplication on both engines) × strategy
  *    ∈ {auto, raw, prefix} (physical only; a divergence here means the
  *    cost-based pick changed the ANSWER, which is the bug class the
  *    strategy-equivalence spec pins on one corpus and this fuzzer
  *    pins on random ones);
  *  - a mid-replay boundary: after a drawn batch count the stream is
  *    STOPPED, optionally compacted ([[graft.streaming.StreamDedup
  *    .compactState]] — the maintenance-window fold), and resumed from
  *    the same checkpoint. Restart and fold are output-neutral by the
  *    exactly-once batch-keyed state contract, so the oracles are
  *    unchanged — a divergence here is an exactly-once bug under a
  *    parameter combination no hand spec pins.
  *
  * FuzzDedupSpec soaks N seeds stream-vs-batch per run (knob
  * SPARK_GRAFT_FUZZ_DEDUP); the fixed [[driverSeeds]] export as
  * `q_fuzzsd_*` entries whose SQL rendering IS the DuckDB oracle.
  */
object FuzzDedup {

  /** Per-plan staged landing dirs, memoized for the life of the JVM
    * (the [[StreamingQ]] staging discipline: chunks are immutable, the
    * bench must not re-pay staging IO per invocation). */
  private val stagedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]

  final case class DPlan(seed: Long) {
    private val rnd = new scala.util.Random(seed * 6700417 + 31)
    val docMod: Option[(Int, Int)] =
      if (rnd.nextBoolean()) {
        val p = Seq(2, 3)(rnd.nextInt(2)); Some((p, rnd.nextInt(p)))
      } else None
    val chunks: Int = Seq(2, 4, 8)(rnd.nextInt(3))
    val tier: Int = rnd.nextInt(4) // 0=lsh 1=winnow 2=containment 3=ladder
    val verifyT: Double = Seq(0.5, 0.6, 0.7, 0.8)(rnd.nextInt(4))
    val maxDf: Long = Seq(5L, 20L, 50L)(rnd.nextInt(3))
    val minShared: Long = Seq(1L, 2L, 3L)(rnd.nextInt(3))
    val tau: (Int, Int) =
      Seq((1, 2), (2, 3), (3, 4), (4, 5), (9, 10))(rnd.nextInt(5))
    val strategy: String = Seq("auto", "raw", "prefix")(rnd.nextInt(3))
    /** Restart/compaction draws (appended LAST so earlier fields keep
      * their per-seed values — the FuzzStream append-last discipline):
      * a drawn mid-replay boundary stops the stream after `k` batches,
      * optionally runs [[graft.streaming.StreamDedup.compactState]]
      * (the maintenance-window fold), and resumes from the same
      * checkpoint. Both are OUTPUT-NEUTRAL by the exactly-once
      * batch-keyed state contract, so the DuckDB oracle and the batch
      * twin are unchanged — which is exactly what makes the draw a
      * differential axis: a restart or fold that changes the admitted
      * set is a real exactly-once bug. The hand specs pin restart and
      * fold per tier at the default thresholds; these draws run them
      * under every drawn parameter combination. */
    val restartAfter: Option[Int] = {
      val k = rnd.nextInt(chunks)
      if (k == 0) None else Some(k)
    }
    val foldAtRestart: Boolean = rnd.nextBoolean()
    /** State-LAYOUT draws (round 16, appended after the restart draws —
      * same append-last discipline, driver seeds keep every earlier
      * field): both are PHYSICAL-ONLY knobs, so the DuckDB oracle and
      * the batch twin are untouched — a divergence means the posting
      * layout or the maintenance fold changed the ADMITTED SET, which
      * is exactly the bug class no hand spec pins at drawn thresholds.
      *
      *  - `postBuckets` ∈ {8, 256}: the posting-state bucket count
      *    (set via the `graft.postBuckets` property for the life of
      *    the replay — the value is baked into state at write time).
      *    At 8, every multi-doc batch SATURATES the bucket set and
      *    [[graft.streaming.StreamDedup.postingState]] takes its
      *    skip-the-isin branch; at 256 the pruned `isin` read runs —
      *    both paths now under randomized thresholds.
      *  - `foldEvery` ∈ {none, 2, 3}: the maintenance CADENCE — every
      *    k-th batch boundary stops the stream, folds ALL state kinds
      *    into the sized base ([[graft.streaming.StreamDedup
      *    .compactState]]), and resumes from the same checkpoint (the
      *    ScaleStream replay discipline), composing with the single
      *    drawn restart boundary. Repeated folds exercise base∪live
      *    re-reads and base-over-base refolds that the one
      *    restart+fold draw touches only once. */
    val postBuckets: Int = Seq(8, 256)(rnd.nextInt(2))
    val foldEvery: Option[Int] = Seq(None, Some(2), Some(3))(rnd.nextInt(3))

    def tierName: String =
      Seq("lsh", "winnow", "containment", "ladder")(tier)

    def describe: String = {
      val corpus = docMod.fold("full") { case (p, r) => s"doc_id%$p=$r" }
      val params = tier match {
        case 0 => s"verifyT=$verifyT"
        case 1 => s"maxDf=$maxDf minShared=$minShared"
        case 2 => s"tau=${tau._1}/${tau._2} strategy=$strategy"
        case _ => s"verifyT=$verifyT maxDf=$maxDf minShared=$minShared " +
          s"tau=${tau._1}/${tau._2} strategy=$strategy"
      }
      val boundary = restartAfter.fold("") { k =>
        s" restart@$k${if (foldAtRestart) "+fold" else ""}"
      }
      val layout = s" buckets=$postBuckets" +
        foldEvery.fold("")(k => s" foldEvery=$k")
      s"$tierName corpus=$corpus chunks=$chunks $params$boundary$layout"
    }

    private def docsOf(s: SparkSession, dir: String): DataFrame = {
      val base = graft.core.Tables(s, dir, "documents")
      docMod.fold(base) { case (p, r) =>
        base.filter(pmod(col("doc_id"), lit(p)) === lit(r))
      }
    }

    private def staged(s: SparkSession, dir: String): java.nio.file.Path =
      stagedMemo.computeIfAbsent(s"$dir#fuzzsd#$seed", _ =>
        StreamingQ.stageFrameChunks(docsOf(s, dir), Seq(col("doc_id")),
          s"fuzzsd_$seed", chunks, blockBytes = Some(64L * 1024)))

    /** Chronological multi-micro-batch replay through the drawn tier's
      * admission loop (the [[StreamingQ.q_stream_dedup_lsh]] harness
      * shape: fresh state root per invocation, tmpfs checkpoint dropped
      * after the replay, scan-split cap so the per-doc kernels
      * parallelize per micro-batch). Chunk files land one at a time —
      * staged outside the watched dir, atomic move, strictly ordered
      * mtimes, the ScaleStream land() discipline — so the drawn
      * restart/fold boundary can stop the stream BETWEEN batches and
      * resume it from the same checkpoint. */
    def runStream(s: SparkSession, dir: String): DataFrame = {
      import graft.streaming.StreamDedup
      import scala.jdk.CollectionConverters._
      val stagedDir = staged(s, dir)
      val chunkFiles = java.nio.file.Files.list(stagedDir).iterator().asScala
        .toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      val schema = s.read.parquet(stagedDir.toString).schema
      val landing = graft.core.Scratch.tempDir("graft_fzdd_land")
      val landStage = graft.core.Scratch.tempDir("graft_fzdd_stg")
      val root = graft.core.Scratch.tempDir("graft_fzdd")
      val ck = graft.core.Scratch.tempDir("graft_fzdd_ck")
      def attach(): org.apache.spark.sql.streaming.StreamingQuery = {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
        tier match {
          case 0 => StreamDedup.lshAdmit(
            stream, root.toString, ck.toString, verifyT)
          case 1 => StreamDedup.winnowAdmit(
            stream, root.toString, ck.toString, maxDf, minShared)
          case 2 => StreamDedup.containAdmit(
            stream, root.toString, ck.toString, tau._1, tau._2, strategy)
          case _ => StreamDedup.ladderAdmit(
            stream, root.toString, ck.toString, verifyT, maxDf, minShared,
            tau._1, tau._2, strategy)
        }
      }
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      val prevSplit = s.conf.get("spark.sql.files.maxPartitionBytes")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      // deleted in the finally (reverse-order walk, same as the
      // checkpoint): every replay writes fresh landing copies + state
      // trees, and deleteOnExit cannot remove non-empty dirs — without
      // eager cleanup each bench pass leaks its whole state tree under
      // /tmp. Only the memoized STAGED chunks persist across replays.
      def rmTree(dir: java.nio.file.Path): Unit =
        try {
          val walk = java.nio.file.Files.walk(dir)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        } catch { case _: java.io.IOException => () }
      // the drawn bucket count holds for the WHOLE replay (baked into
      // state at write time — a mid-replay change would split the
      // posting layout); restored in the finally. The override window is
      // held under StreamDedup.layoutOverrideLock: PostBuckets is a
      // process-global read at every state write/read, so overlapping
      // replays (or any concurrent dedup stream in this JVM) must be
      // impossible by construction, not by test-ordering accident
      // (round-17 advice)
      StreamDedup.layoutOverrideLock.synchronized {
      val prevPb = sys.props.get("graft.postBuckets")
      sys.props("graft.postBuckets") = postBuckets.toString
      var q = attach()
      try {
        chunkFiles.zipWithIndex.foreach { case (f, i) =>
          // the drawn restart boundary OWNS its fold decision: when the
          // draw says restart WITHOUT a fold, the cadence must not fold
          // there either, or the no-fold recovery path (resume over
          // unfolded live state) silently stops being exercised on
          // seeds where the boundaries coincide (round-17 advice)
          val cadenceFold = foldEvery.exists(k => i > 0 && i % k == 0) &&
            !(restartAfter.contains(i) && !foldAtRestart)
          if (restartAfter.contains(i) || cadenceFold) {
            q.stop()
            if (cadenceFold || (restartAfter.contains(i) && foldAtRestart))
              StreamDedup.compactState(s, root.toString)
            q = attach()
          }
          val tmp = landStage.resolve(f.getFileName.toString)
          java.nio.file.Files.copy(f, tmp)
          tmp.toFile.setLastModified(f.toFile.lastModified())
          java.nio.file.Files.move(tmp, landing.resolve(f.getFileName.toString),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          q.processAllAvailable()
        }
        // materialize the admitted set BEFORE the state tree is deleted
        // below — the returned frame must not lazily re-read `root`
        val admitted = StreamDedup.readAdmitted(s, root.toString)
          .orderBy(col("doc_id"))
        s.createDataFrame(
          java.util.Arrays.asList(admitted.collect(): _*), admitted.schema)
      } finally {
        q.stop()
        prevPb match {
          case Some(v) => sys.props("graft.postBuckets") = v
          case None => sys.props.remove("graft.postBuckets"); ()
        }
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
        Seq(ck, landing, landStage, root).foreach(rmTree)
      }
      } // layoutOverrideLock
    }

    // ---- batch twin: ntile chunks + earlier-chunk window joins --------
    // Shares the per-doc KERNELS (shingleOf / bandedOf / winnowFps /
    // jaccard) with the streaming side — byte-identical keys are the
    // point — but none of the state machinery: no foreachBatch, no
    // posting buckets, no prefix filter, no strategy axis. A pruning
    // bug in any of those diverges here.

    private def chunkOf(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"),
        ntile(chunks).over(Window.orderBy(col("doc_id"))).as("b"))

    private def exactMatched(docs: DataFrame, chunk: DataFrame): DataFrame = {
      val t = docs.select(col("doc_id"), col("text")).join(chunk, Seq("doc_id"))
      val p = t.select(col("text"), col("b").as("pb"))
      t.select(col("doc_id"), col("text"), col("b").as("nb"))
        .join(p, Seq("text")).filter(col("pb") < col("nb"))
        .select("doc_id").distinct()
    }

    private def lshMatched(d: DataFrame, chunk: DataFrame): DataFrame = {
      val banded = Dedup.bandedOf(d).join(chunk, Seq("doc_id"))
      val pa = banded.select(col("doc_id").as("prev_id"),
        col("band"), col("bkey"), col("b").as("pb"))
      val nb = banded.select(col("doc_id").as("new_id"),
        col("band"), col("bkey"), col("b").as("nb"))
      pa.join(nb, Seq("band", "bkey")).filter(col("pb") < col("nb"))
        .select("prev_id", "new_id").distinct()
        .join(d.select(col("doc_id").as("prev_id"),
          col("sh").as("sh_p"), col("nsh").as("np")), Seq("prev_id"))
        .join(d.select(col("doc_id").as("new_id"),
          col("sh").as("sh_n"), col("nsh").as("nn")), Seq("new_id"))
        .filter(Dedup.jaccard(col("sh_p"), col("sh_n"),
          col("np"), col("nn")) >= verifyT)
        .select(col("new_id").as("doc_id")).distinct()
    }

    private def winnowMatchedB(docs: DataFrame, chunk: DataFrame): DataFrame = {
      val fps = TextAnalysis.winnowFps(docs).join(chunk, Seq("doc_id"))
      val w = Window.partitionBy(col("fp")).orderBy(col("b"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val fdf = fps.withColumn("df_before", count(lit(1)).over(w))
      fps.select(col("fp"), col("doc_id").as("prev_id"), col("b").as("pb"))
        .join(fdf.select(col("fp"), col("doc_id").as("new_id"),
          col("b").as("nb"), col("df_before")), Seq("fp"))
        .filter(col("pb") < col("nb") && col("df_before") <= maxDf)
        .groupBy(col("prev_id"), col("new_id")).agg(count(lit(1)).as("ns"))
        .filter(col("ns") >= minShared)
        .select(col("new_id").as("doc_id")).distinct()
    }

    private def containMatchedB(d: DataFrame, chunk: DataFrame): DataFrame = {
      val pg = d.select(col("doc_id"), explode(col("sh")).as("g"))
        .join(chunk, Seq("doc_id"))
      pg.select(col("g"), col("doc_id").as("prev_id"), col("b").as("pb"))
        .join(pg.select(col("g"), col("doc_id").as("new_id"),
          col("b").as("nb")), Seq("g"))
        .filter(col("pb") < col("nb"))
        .select("prev_id", "new_id").distinct()
        .join(d.select(col("doc_id").as("prev_id"),
          col("sh").as("sh_p")), Seq("prev_id"))
        .join(d.select(col("doc_id").as("new_id"),
          col("sh").as("sh_n"), col("nsh").as("nn")), Seq("new_id"))
        // sh is a DISTINCT shingle set, so |A ∩ B| via array_intersect
        // matches the oracle's list_filter count; exact integer
        // cross-multiplication, same as the engine path
        .filter(size(array_intersect(col("sh_n"), col("sh_p")))
          * lit(tau._2) >= col("nn") * lit(tau._1))
        .select(col("new_id").as("doc_id")).distinct()
    }

    /** The independent batch-window formulation (spec comparator). */
    def runBatch(s: SparkSession, dir: String): DataFrame = {
      val docs = docsOf(s, dir)
      val chunk = chunkOf(docs).cache()
      val d = Dedup.shingleOf(docs).cache()
      try {
        val matched = tier match {
          case 0 => lshMatched(d, chunk)
          case 1 => winnowMatchedB(docs, chunk)
          case 2 => containMatchedB(d, chunk)
          case _ => exactMatched(docs, chunk)
            .unionByName(lshMatched(d, chunk))
            .unionByName(winnowMatchedB(docs, chunk))
            .unionByName(containMatchedB(d, chunk))
            .distinct()
        }
        val out = chunk.join(matched, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("b").cast("long").as("batch"))
          .orderBy(col("doc_id"))
        // return a LOCALLY materialized frame: the plan reads the cached
        // chunk/d frames that the finally block unpersists, so a lazy
        // return would silently recompute the whole plan uncached at the
        // caller's collect (the round-15 advice finding — the bare
        // collect-then-return-lazy form did exactly that)
        s.createDataFrame(
          java.util.Arrays.asList(out.collect(): _*), out.schema)
      } finally { chunk.unpersist(); d.unpersist(); () }
    }

    // ---- DuckDB rendering (the driver-seed oracle) ---------------------

    /** The residue draw shadows `documents` for every downstream CTE
      * (DuckDB resolves the self-reference via the explicit `main.`
      * schema); the shared [[Dedup.shingleSql]] / winnow CTEs then read
      * the narrowed corpus unchanged. */
    private def baseCtes: String = {
      val shadow = docMod.map { case (p, r) =>
        s"documents AS (SELECT * FROM main.documents WHERE doc_id % $p = $r),\n"
      }.getOrElse("")
      s"""${shadow}shs AS (${Dedup.shingleSql}),
         |chunk AS (SELECT doc_id, ntile($chunks) OVER (ORDER BY doc_id) AS b
         |          FROM documents)""".stripMargin
    }

    private def emCte: String =
      s"""em AS (
         |  SELECT DISTINCT cn.doc_id
         |  FROM documents p JOIN documents n ON p.text = n.text
         |  JOIN chunk cp ON cp.doc_id = p.doc_id
         |  JOIN chunk cn ON cn.doc_id = n.doc_id
         |  WHERE cp.b < cn.b)""".stripMargin

    private def lmCtes: String = {
      val r = Dedup.MINHASH_K / Dedup.BANDS
      val bandSelects = (0 until Dedup.BANDS).map { b =>
        val parts = (0 until r).map(i => s"sig[${b * r + i + 1}]::VARCHAR")
        s"SELECT doc_id, sh, $b AS band, md5(${parts.mkString(" || ',' || ")}) AS bkey FROM sig"
      }
      val sigList = (0 until Dedup.MINHASH_K)
        .map(j => Sql.minhash("sh", j)).mkString(", ")
      s"""sig AS (SELECT doc_id, sh, [$sigList] AS sig FROM shs),
         |banded AS (
         |  ${bandSelects.mkString("\n  UNION ALL ")}
         |),
         |lm AS (
         |  SELECT DISTINCT nb.doc_id
         |  FROM banded pa JOIN banded nb
         |    ON pa.band = nb.band AND pa.bkey = nb.bkey
         |  JOIN chunk ca ON ca.doc_id = pa.doc_id
         |  JOIN chunk cb ON cb.doc_id = nb.doc_id
         |  WHERE ca.b < cb.b
         |    AND ${Dedup.jaccardSql("pa.sh", "nb.sh")} >= $verifyT)""".stripMargin
    }

    private def wmCtes: String =
      s"""${TextAnalysis.winnowSql},
         |wf AS (SELECT fps.doc_id, fps.fp, chunk.b
         |      FROM fps JOIN chunk ON fps.doc_id = chunk.doc_id),
         |wdf AS (SELECT doc_id, fp, b,
         |          count(*) OVER (PARTITION BY fp ORDER BY b
         |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |            AS df_before
         |        FROM wf),
         |wcand AS (
         |  SELECT p.doc_id AS prev_id, n.doc_id AS new_id
         |  FROM wf p JOIN wdf n ON p.fp = n.fp AND p.b < n.b
         |  WHERE n.df_before <= $maxDf),
         |wm AS (SELECT DISTINCT new_id AS doc_id
         |       FROM (SELECT prev_id, new_id, count(*) AS ns
         |             FROM wcand GROUP BY 1, 2)
         |       WHERE ns >= $minShared)""".stripMargin

    private def cmCtes: String =
      s"""pg AS (SELECT shs.doc_id, unnest(sh) AS g, chunk.b
         |      FROM shs JOIN chunk ON shs.doc_id = chunk.doc_id),
         |ccand AS (SELECT DISTINCT p.doc_id AS prev_id, n.doc_id AS new_id
         |  FROM pg p JOIN pg n ON p.g = n.g AND p.b < n.b),
         |cm AS (SELECT DISTINCT c.new_id AS doc_id
         |  FROM ccand c
         |  JOIN shs sp ON sp.doc_id = c.prev_id
         |  JOIN shs sn ON sn.doc_id = c.new_id
         |  WHERE len(list_filter(sn.sh, x -> list_contains(sp.sh, x))) * ${tau._2}
         |          >= len(sn.sh) * ${tau._1})""".stripMargin

    def sql: String = {
      val (ctes, matchedSel) = tier match {
        case 0 => (Seq(lmCtes), "SELECT doc_id FROM lm")
        case 1 => (Seq(wmCtes), "SELECT doc_id FROM wm")
        case 2 => (Seq(cmCtes), "SELECT doc_id FROM cm")
        case _ => (Seq(emCte, lmCtes, wmCtes, cmCtes),
          "SELECT doc_id FROM em UNION SELECT doc_id FROM lm " +
            "UNION SELECT doc_id FROM wm UNION SELECT doc_id FROM cm")
      }
      s"""
      |WITH $baseCtes,
      |${ctes.mkString(",\n")}
      |SELECT c.doc_id, c.b AS batch FROM chunk c
      |WHERE c.doc_id NOT IN ($matchedSel)
      |ORDER BY c.doc_id
      |""".stripMargin
    }
  }

  /** Fixed driver seeds under the DuckDB oracle — one per tier, each on
    * parameter points the hand-written entries DON'T pin (see each
    * seed's `describe` in FuzzDedupSpec output): 11 = LSH, full corpus,
    * 4 chunks, verifyT 0.6 (the threshold axis below the pinned 0.7);
    * 40 = winnow, doc_id%3=2, 8 chunks, maxDf 5 + minShared 2 (a df cap
    * tight enough to cut real candidates, twice the batch boundaries);
    * 6 = containment, doc_id%2=0, 2 chunks, τ 2/3 RAW-forced (coarse
    * rational + the strategy knob off its auto default); 52 = the
    * composed ladder, doc_id%3=1, 4 chunks, verifyT 0.8 + maxDf 20 +
    * minShared 2 + τ 4/5, auto strategy (every tier threshold moved at
    * once on a narrowed corpus). All four also draw a mid-replay
    * restart boundary (11 and 40 with a compaction fold at it, 6 and
    * 52 restart-only), so every driver entry runs exactly-once
    * recovery — and two run the maintenance fold — under the DuckDB
    * oracle every round. Round-16 layout draws land as: 11 and 6 run
    * the 8-bucket posting layout (saturated bucket set — the isin-skip
    * read path), 40 and 52 the 256-bucket pruned path; all four draw a
    * fold CADENCE (every 2-3 batches), so repeated base∪live refolds
    * run under the oracle too. */
  val driverSeeds: Seq[Long] = Seq(11L, 40L, 6L, 52L)

  val all: Seq[Q] = driverSeeds.map { s =>
    val p = DPlan(s)
    Q(s"q_fuzzsd_$s", (spark, dir) => p.runStream(spark, dir), Some(p.sql))
  }
}
