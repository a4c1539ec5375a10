package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming dedup ADMISSION — the incremental dedup a live ingestion
  * pipeline runs, as a ladder of three tiers over one shared state
  * discipline (exact-hash streaming dedup, the zeroth tier, lives in
  * `StreamingQ.q_stream_dedup`):
  *
  *  - [[lshAdmit]] — MinHash-LSH near-dup (batch twin
  *    `Dedup.q_dedup_minhash_lsh`): reject if an EARLIER-batch doc
  *    shares an LSH band key and verifies at Jaccard ≥ `verifyT`;
  *  - [[winnowAdmit]] — partial overlap (batch twin `q_dedup_winnow`):
  *    reject if an earlier doc shares ≥ minShared MOSS winnowing
  *    fingerprints through fps below the boilerplate df cut;
  *  - [[containAdmit]] — containment (batch twin
  *    `q_dedup_containment`): reject if one earlier doc contains ≥ t
  *    of the new doc's distinct 3-shingles (exact prefix-filter
  *    candidate cut).
  *
  * EVERY batch document's keys/sets are appended to persisted state
  * regardless of admission — first-seen wins, so a dup of a dropped
  * dup is still a dup.
  *
  * Exactly-once like [[IndexMaintain]]: all three state/output surfaces
  * land under batch-keyed dirs with overwrite semantics, and the
  * candidate join reads ONLY state with batch < current (partition
  * pruning on the dir key for live batch dirs; a plain data-column
  * filter on the compacted base), so an at-least-once replay of a
  * micro-batch replaces its own state and can never match against it —
  * StreamLshDedupSpec pins restart-resume.
  *
  * == The 100 TB state discipline (round-12 verdict) ==
  *
  * Per-batch cost must track the BATCH, not the accumulated corpus:
  *
  *  - '''Broadcast-pinned joins.''' Every per-batch join explicitly
  *    `broadcast()`s its bounded batch-derived side — the banded batch
  *    in the candidate join, the candidate id-pairs in the shingle
  *    re-attach, the batch shingles in the verify join, the matched ids
  *    in the output anti join — so the corpus-sized state side is only
  *    ever SCANNED, never shuffled. Without the pins the optimizer is
  *    free to sort-merge the full accumulated state each micro-batch: a
  *    per-batch Exchange linear in corpus size, quadratic over the
  *    stream's life. StreamLshDedupSpec pins the plan (no Exchange
  *    anywhere above a raw state scan). The only shuffles left are
  *    candidate-scale: the id-pair `distinct` and the matched-id
  *    `distinct`, whose cardinality is driven by the batch's band
  *    collisions, not by corpus size.
  *  - '''Compacted at-rest state.''' Live state lands as one dir per
  *    micro-batch (the idempotence unit), which unbounded would fragment
  *    scans and file listings. [[compactState]] folds the accumulated
  *    batch dirs into `bands_base`/`sh_base` at maintenance windows —
  *    the [[graft.index.Blocks.compactStreamBlocks]] discipline applied
  *    to dedup state, sized by [[graft.sink.Compaction.planFiles]] so
  *    the base is ~targetBytes files regardless of how many triggers
  *    produced it. The fold keeps `batch` as a DATA column, so the
  *    serving read applies the same `batch < current` pruning to the
  *    base — a replay of a folded boundary batch re-lands its dir and
  *    stays blind to its own folded rows (the candidate `distinct`
  *    absorbs the transient dir∪base double-count of that one batch).
  *    Bucketing the base would buy nothing here: with the batch side
  *    broadcast-pinned the state never enters a shuffle for the join to
  *    elide, so the at-rest lever is file count/size, not bucket
  *    co-location (contrast `VectorTable.writeBucketed`, whose
  *    bucket-join consumers shuffle NEITHER side because BOTH are
  *    corpus-sized — here one side is always a bounded micro-batch).
  *
  * Scale shape: state is (band, bkey, doc_id) triples — id-only; the
  * shingle arrays join in just for band-verified candidates (the
  * q_dedup_minhash_lsh discipline).
  */
object StreamDedup {

  private def bandsRoot(stateRoot: String) = s"$stateRoot/bands"
  private def shRoot(stateRoot: String) = s"$stateRoot/sh"

  private def exists(sp: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(sp.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Accumulated state strictly BEFORE `batchId`: compacted base (batch
    * is a data column there) ∪ live batch dirs (batch is the partition
    * dir key) — None when neither exists yet. `cols` projects both
    * sides to one layout. */
  private def readState(sp: SparkSession, stateRoot: String, kind: String,
      batchId: Long, cols: Seq[String]): Option[DataFrame] = {
    val live = s"$stateRoot/$kind"
    val base = s"$stateRoot/${kind}_base"
    val parts = Seq(live, base).filter(exists(sp, _)).map(d =>
      sp.read.parquet(d).filter(col("batch") < batchId)
        .select(cols.map(col): _*))
    parts.reduceOption(_.unionByName(_))
  }

  /** The per-batch admission core, exposed for plan-shape pinning:
    * matched (near-dup-of-earlier) doc ids of the current batch, given
    * the batch's shingles `d` (doc_id, sh, nsh), its band keys `banded`
    * (doc_id, band, bkey), and the prior band/shingle state. Both state
    * frames are corpus-sized; every join broadcasts the bounded side so
    * state rows are scanned, never shuffled. */
  private[streaming] def matchedAgainstState(d: DataFrame, banded: DataFrame,
      pb: DataFrame, psh: DataFrame, verifyT: Double): DataFrame = {
    val cand = pb
      .select(col("doc_id").as("prev_id"), col("band"), col("bkey"))
      .join(broadcast(banded.select(col("doc_id").as("new_id"),
        col("band"), col("bkey"))), Seq("band", "bkey"))
      .select(col("prev_id"), col("new_id")).distinct()
    psh.select(col("doc_id").as("prev_id"),
        col("sh").as("sh_p"), col("nsh").as("np"))
      .join(broadcast(cand), Seq("prev_id"))
      .join(broadcast(d.select(col("doc_id").as("new_id"),
        col("sh").as("sh_n"), col("nsh").as("nn"))), Seq("new_id"))
      .filter(Dedup.jaccard(col("sh_p"), col("sh_n"),
        col("np"), col("nn")) >= verifyT)
      .select(col("new_id").as("doc_id")).distinct()
  }

  /** The containment per-batch admission core, exposed for plan-shape
    * pinning: matched (mostly-contained-in-an-earlier-doc) ids of the
    * current batch, given the batch's shingle sets `d` (doc_id, sh,
    * nsh), the accumulated shingle-posting state `post` (doc_id, g) and
    * shingle-set state `psh` (doc_id, sh, nsh). A new doc N matches iff
    * ∃ earlier P with |sh(N) ∩ sh(P)| / |sh(N)| ≥ `t`.
    *
    * Candidate generation is the EXACT prefix filter of
    * [[graft.dedup.SetSimJoin]], batch-order-aware: if containment ≥ t
    * then an earlier doc misses at most (1−t)·|A| of A's shingles, so
    * it must share one of ANY ⌊(1−t)·|A|⌋+1 of them — the theorem
    * holds for every subset of that size, and picking the RAREST (by
    * PRIOR document frequency, one broadcast-semi-joined scan of the
    * posting state — batch-bounded like the winnow df pass) just
    * minimizes candidate fan-out; it cannot change the answer. The
    * prefix rank is a window over BATCH rows only. Like every tier
    * here, state is scanned, never shuffled: posting and shingle state
    * join against broadcast batch-derived frames. */
  private[streaming] def containMatched(d: DataFrame, post: DataFrame,
      psh: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = d.select(col("doc_id"), col("nsh"),
      explode(transform(col("sh"), s => xxhash64(s))).as("g"))
    val dfOf = post.join(broadcast(bg.select(col("g")).distinct()), Seq("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
    // rarest-first rank within each batch doc; df 0 for unseen shingles
    val ranked = bg.join(broadcast(dfOf), Seq("g"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
    val prefix = ranked
      .filter(col("rk") <= floor((lit(1.0) - lit(t)) * col("nsh")) + 1)
      .select(col("doc_id").as("new_id"), col("g"))
    val cand = post.select(col("doc_id").as("prev_id"), col("g"))
      .join(broadcast(prefix), Seq("g"))
      .select(col("prev_id"), col("new_id")).distinct()
    psh.select(col("doc_id").as("prev_id"), col("sh").as("sh_p"))
      .join(broadcast(cand), Seq("prev_id"))
      .join(broadcast(d.select(col("doc_id").as("new_id"),
        col("sh").as("sh_n"), col("nsh").as("nn"))), Seq("new_id"))
      .filter(size(array_intersect(col("sh_n"), col("sh_p"))).cast("double")
        / col("nn").cast("double") >= t)
      .select(col("new_id").as("doc_id")).distinct()
  }

  /** Streaming containment admission — the fourth tier of the live
    * dedup ladder (exact hash → MinHash-LSH → winnow overlap → shingle
    * containment): a document is ADMITTED iff no EARLIER-batch document
    * CONTAINS ≥ `t` of its distinct 3-shingles — the "reject crawl
    * pages whose content is mostly already in the corpus" rule, the
    * batch-order-aware twin of
    * [[graft.queries.Dedup.q_dedup_containment]] with the same exact
    * prefix-filter candidate cut (see [[containMatched]]). First-seen
    * wins; same batch-keyed exactly-once layout, broadcast-pinned
    * joins, and [[compactState]] maintenance (kinds `post` + `sh`). */
  def containAdmit(docs: DataFrame, stateRoot: String, checkpoint: String,
      t: Double = 0.8): StreamingQuery = {
    val outRoot = admittedRoot(stateRoot)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val d = Dedup.shingleOf(batch.toDF()).cache()
        try {
          val matched = (
            readState(sp, stateRoot, "post", batchId, Seq("doc_id", "g")),
            readState(sp, stateRoot, "sh", batchId,
              Seq("doc_id", "sh", "nsh"))) match {
            case (Some(post), Some(psh)) => containMatched(d, post, psh, t)
            case _ => sp.range(0).select(col("id").as("doc_id"))
          }
          batch.toDF().select(col("doc_id"))
            .join(broadcast(matched), Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outRoot/batch=${batchId + 1}")
          // posting keys are 64-bit shingle hashes, not the shingle
          // strings: equality is all candidate generation needs, a hash
          // collision only ADDS a candidate the exact array-intersect
          // verify then drops (admission decisions provably unchanged),
          // and the at-rest posting state shrinks to two longs per row —
          // the state term every batch scans (measured: string postings
          // made the 10× per-batch wall GROW 2.7× across the replay
          // where the LSH tier's md5-key band state stayed flat)
          d.select(col("doc_id"),
              explode(transform(col("sh"), s => xxhash64(s))).as("g"))
            .write.mode("overwrite")
            .parquet(s"$stateRoot/post/batch=$batchId")
          d.select(col("doc_id"), col("sh"), col("nsh"))
            .write.mode("overwrite").parquet(s"$stateRoot/sh/batch=$batchId")
        } finally { d.unpersist(); () }
        ()
      }
      .start()
  }

  /** Attach the LSH admission loop to a document stream (doc_id, text,
    * ...). Admitted ids land under `stateRoot/admitted/batch=<n>` with
    * n = batchId + 1 (1-based, matching an ntile replay oracle); band
    * and shingle state under `stateRoot/bands|sh/batch=<batchId>` (live)
    * plus `stateRoot/bands_base|sh_base` once [[compactState]] has run.
    * The returned query is live; callers own its lifecycle. */
  def lshAdmit(docs: DataFrame, stateRoot: String, checkpoint: String,
      verifyT: Double = Dedup.MINHASH_VERIFY_T): StreamingQuery = {
    val outRoot = admittedRoot(stateRoot)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val d = Dedup.shingleOf(batch.toDF()).cache()
        val banded = Dedup.bandedOf(d).cache()
        try {
          val matched = (
            readState(sp, stateRoot, "bands", batchId,
              Seq("doc_id", "band", "bkey")),
            readState(sp, stateRoot, "sh", batchId,
              Seq("doc_id", "sh", "nsh"))) match {
            case (Some(pb), Some(psh)) =>
              matchedAgainstState(d, banded, pb, psh, verifyT)
            case _ => sp.range(0).select(col("id").as("doc_id"))
          }
          // `batch` is NOT a data column in the live dirs — it comes
          // back from the partition dir key on read (a same-named data
          // column would collide with partition discovery)
          batch.toDF().select(col("doc_id"))
            .join(broadcast(matched), Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outRoot/batch=${batchId + 1}")
          // state append AFTER the match (an at-least-once replay
          // overwrites these same dirs; the batch< filter above makes
          // the replay blind to them)
          banded.write.mode("overwrite")
            .parquet(s"${bandsRoot(stateRoot)}/batch=$batchId")
          d.select(col("doc_id"), col("sh"), col("nsh"))
            .write.mode("overwrite").parquet(s"${shRoot(stateRoot)}/batch=$batchId")
        } finally { d.unpersist(); banded.unpersist() }
        ()
      }
      .start()
  }

  /** The winnow per-batch admission core, exposed for plan-shape
    * pinning: matched (heavy-overlap-with-earlier) doc ids of the
    * current batch, given the batch's winnow fingerprints `bfps`
    * (doc_id, fp) and the accumulated fingerprint state `stateF`.
    *
    * The df cut mirrors [[graft.queries.Dedup.q_dedup_winnow]]'s
    * boilerplate guard, computed batch-order-aware WITHOUT a corpus
    * aggregate: only fps present in the batch can produce candidates,
    * so their prior document frequency is one broadcast-semi-joined
    * scan of state — the partial count combines map-side to at most
    * |batch fps| rows per partition, so the df shuffle is
    * batch-bounded, not vocabulary- or corpus-bounded. Saturated fps
    * (df > maxDf — boilerplate) produce no candidates, exactly the
    * batch twin's cut. Candidates then require ≥ `minShared` shared
    * df-ok fingerprints per (prev, new) pair. */
  private[streaming] def winnowMatched(bfps: DataFrame, stateF: DataFrame,
      maxDf: Long, minShared: Long): DataFrame = {
    val batchFps = bfps.select(col("fp")).distinct()
    val okFps = stateF.join(broadcast(batchFps), Seq("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val newSide = bfps.select(col("doc_id").as("new_id"), col("fp"))
      .join(broadcast(okFps), Seq("fp"), "left_semi")
    stateF.select(col("doc_id").as("prev_id"), col("fp"))
      .join(broadcast(newSide), Seq("fp"))
      .groupBy(col("prev_id"), col("new_id"))
      .agg(count(lit(1)).as("ns"))
      .filter(col("ns") >= minShared)
      .select(col("new_id").as("doc_id")).distinct()
  }

  /** Streaming winnow (partial-overlap) admission — the live form of
    * "reject crawl pages that heavily quote the corpus": a document is
    * ADMITTED iff no document from an EARLIER micro-batch shares
    * ≥ `minShared` winnowing fingerprints with it through fps whose
    * PRIOR document frequency is ≤ `maxDf` (the
    * [[graft.queries.Dedup.q_dedup_winnow]] rule, batch-order-aware —
    * the third admission tier next to exact-hash and MinHash-LSH).
    * First-seen wins like [[lshAdmit]]: every doc's fingerprints land
    * in state regardless of admission; same batch-keyed exactly-once
    * layout, same broadcast-pinned per-batch joins, same
    * [[compactState]] maintenance (kind `fps`). Admitted ids land
    * under `stateRoot/admitted/batch=<n>`, n = batchId + 1. */
  def winnowAdmit(docs: DataFrame, stateRoot: String, checkpoint: String,
      maxDf: Long = 50L, minShared: Long = 2L): StreamingQuery = {
    val outRoot = admittedRoot(stateRoot)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val bfps = graft.queries.TextAnalysis.winnowFps(batch.toDF()).cache()
        try {
          val matched =
            readState(sp, stateRoot, "fps", batchId, Seq("doc_id", "fp"))
              .map(winnowMatched(bfps, _, maxDf, minShared))
              .getOrElse(sp.range(0).select(col("id").as("doc_id")))
          batch.toDF().select(col("doc_id"))
            .join(broadcast(matched), Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outRoot/batch=${batchId + 1}")
          bfps.write.mode("overwrite")
            .parquet(s"$stateRoot/fps/batch=$batchId")
        } finally { bfps.unpersist(); () }
        ()
      }
      .start()
  }

  /** MAINTENANCE-WINDOW state compaction: fold every live
    * `bands|sh|fps|admitted/batch=*` dir (plus any previous base) into
    * `<kind>_base` — ~`targetBytes` parquet files total, batch
    * preserved as a data column — and drop the live dirs. Returns
    * false (no-op) when no live state exists. The admitted OUTPUT is
    * folded under the same contract as the dedup state and
    * [[graft.index.Blocks.compactStreamBlocks]]: one dir per trigger
    * fragments scans without bound, and a stopped-and-committed stream
    * never replays a folded batch (unlike the state kinds, the output
    * has no `batch < current` read pruning to make a boundary replay
    * self-blind — the stopped-stream contract is what makes the fold
    * safe, exactly as for index blocks). Read the admitted set back
    * with [[readAdmitted]], which unions base and live.
    *
    * Contract (same as [[graft.index.Blocks.compactStreamBlocks]]): run
    * ONLY while the admission stream is stopped AND its checkpoint fully
    * committed. The swap is write-to-staging then delete-and-rename
    * (on a real deployment: a table-format manifest commit); the
    * staging dir survives a crash for manual recovery. Even if a
    * resumed stream replays the boundary batch, the base's `batch`
    * data column keeps the replay blind to its own folded rows — see
    * the class doc. */
  def compactState(spark: SparkSession, stateRoot: String,
      targetBytes: Long = 128L * 1024 * 1024): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    def foldOne(kind: String, cols: Seq[String]): Boolean = {
      val live = new org.apache.hadoop.fs.Path(s"$stateRoot/$kind")
      val fs = live.getFileSystem(conf)
      if (!fs.exists(live)) return false
      val base = new org.apache.hadoop.fs.Path(s"$stateRoot/${kind}_base")
      val withBatch = cols :+ "batch"
      val liveDf = spark.read.parquet(live.toString)
        .withColumn("batch", col("batch").cast("long"))
        .select(withBatch.map(col): _*)
      val all =
        if (fs.exists(base))
          spark.read.parquet(base.toString).select(withBatch.map(col): _*)
            .unionByName(liveDf)
        else liveDf
      // size the base like any corpus compaction: ⌈bytes/target⌉ files
      // via a NARROW coalesce (see graft.sink.Compaction) — state scans
      // then pay O(base files), not O(total triggers ever fired)
      val bytes =
        (fs.getContentSummary(live).getLength
          + (if (fs.exists(base)) fs.getContentSummary(base).getLength else 0L))
      val n = graft.sink.Compaction.planFiles(bytes, targetBytes)
      val staging = s"$stateRoot/${kind}_compact"
      val folded = all
      (if (folded.rdd.getNumPartitions > n) folded.coalesce(n) else folded)
        .write.mode("overwrite").parquet(staging)
      fs.delete(base, true)
      fs.delete(live, true)
      fs.rename(new org.apache.hadoop.fs.Path(staging), base)
      true
    }
    val b = foldOne("bands", Seq("doc_id", "band", "bkey"))
    val s = foldOne("sh", Seq("doc_id", "sh", "nsh"))
    val f = foldOne("fps", Seq("doc_id", "fp"))
    val g = foldOne("post", Seq("doc_id", "g"))
    val a = foldOne("admitted", Seq("doc_id"))
    b || s || f || g || a
  }

  /** Where [[lshAdmit]]/[[winnowAdmit]] land admitted ids (partitioned
    * by `batch`, 1-based). */
  def admittedRoot(stateRoot: String): String = s"$stateRoot/admitted"

  /** The admitted (doc_id, batch) set — live per-trigger dirs unioned
    * with the compacted `admitted_base` (batch normalized to long; the
    * live dirs' partition key reads back as int). This is the read
    * path every consumer of the admission loop should use once
    * [[compactState]] has ever run. */
  def readAdmitted(sp: SparkSession, stateRoot: String): DataFrame = {
    val parts = Seq(admittedRoot(stateRoot), s"$stateRoot/admitted_base")
      .filter(exists(sp, _)).map(d => sp.read.parquet(d)
        .select(col("doc_id"), col("batch").cast("long").as("batch")))
    require(parts.nonEmpty, s"no admitted output under $stateRoot")
    parts.reduce(_.unionByName(_))
  }
}
