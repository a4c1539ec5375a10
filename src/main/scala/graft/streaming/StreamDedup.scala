package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MinHash-LSH near-dup admission — the incremental dedup a
  * live ingestion pipeline runs (batch twin:
  * `graft.queries.Dedup.q_dedup_minhash_lsh`; exact-hash streaming
  * dedup: `StreamingQ.q_stream_dedup`). A document is ADMITTED iff no
  * document from an EARLIER micro-batch is a verified near-dup (shared
  * LSH band key + Jaccard ≥ `verifyT` over distinct 3-shingle sets).
  * EVERY batch document's band keys and shingle set are appended to
  * persisted state regardless of admission — first-seen wins, so a dup
  * of a dropped dup is still a dup.
  *
  * Exactly-once like [[IndexMaintain]]: all three state/output surfaces
  * land under batch-keyed dirs with overwrite semantics, and the
  * candidate join reads ONLY partitions with batch < current (partition
  * pruning on the dir key), so an at-least-once replay of a micro-batch
  * replaces its own state and can never match against it —
  * StreamLshDedupSpec pins restart-resume.
  *
  * Scale shape: state is (band, bkey, doc_id) triples — id-only; the
  * shingle arrays join in just for band-verified candidates (the
  * q_dedup_minhash_lsh discipline), and the band join is a bucketed
  * equi-join per micro-batch (batch × state-bucket, never
  * batch × corpus).
  */
object StreamDedup {

  /** Attach the LSH admission loop to a document stream (doc_id, text,
    * ...). Admitted ids land under `stateRoot/admitted/batch=<n>` with
    * n = batchId + 1 (1-based, matching an ntile replay oracle); band
    * and shingle state under `stateRoot/bands|sh/batch=<batchId>`. The
    * returned query is live; callers own its lifecycle. */
  def lshAdmit(docs: DataFrame, stateRoot: String, checkpoint: String,
      verifyT: Double = Dedup.MINHASH_VERIFY_T): StreamingQuery = {
    val bandsRoot = s"$stateRoot/bands"
    val shRoot = s"$stateRoot/sh"
    val outRoot = admittedRoot(stateRoot)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val d = Dedup.shingleOf(batch.toDF()).cache()
        val banded = Dedup.bandedOf(d).cache()
        try {
          val matched =
            if (batchId == 0L)
              sp.range(0).select(col("id").as("doc_id"))
            else {
              val pb = sp.read.parquet(bandsRoot).filter(col("batch") < batchId)
              val psh = sp.read.parquet(shRoot).filter(col("batch") < batchId)
              val cand = pb
                .select(col("doc_id").as("prev_id"), col("band"), col("bkey"))
                .join(banded.select(col("doc_id").as("new_id"),
                  col("band"), col("bkey")), Seq("band", "bkey"))
                .select(col("prev_id"), col("new_id")).distinct()
              cand
                .join(psh.select(col("doc_id").as("prev_id"),
                  col("sh").as("sh_p"), col("nsh").as("np")), Seq("prev_id"))
                .join(d.select(col("doc_id").as("new_id"),
                  col("sh").as("sh_n"), col("nsh").as("nn")), Seq("new_id"))
                .filter(Dedup.jaccard(col("sh_p"), col("sh_n"),
                  col("np"), col("nn")) >= verifyT)
                .select(col("new_id").as("doc_id")).distinct()
            }
          // `batch` is NOT a data column — it comes back from the
          // partition dir key on read (a same-named data column would
          // collide with partition discovery)
          batch.toDF().select(col("doc_id"))
            .join(matched, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$outRoot/batch=${batchId + 1}")
          // state append AFTER the match (an at-least-once replay
          // overwrites these same dirs; the batch< filter above makes
          // the replay blind to them)
          banded.write.mode("overwrite")
            .parquet(s"$bandsRoot/batch=$batchId")
          d.select(col("doc_id"), col("sh"), col("nsh"))
            .write.mode("overwrite").parquet(s"$shRoot/batch=$batchId")
        } finally { d.unpersist(); banded.unpersist() }
        ()
      }
      .start()
  }

  /** Where [[lshAdmit]] lands admitted ids (partitioned by `batch`). */
  def admittedRoot(stateRoot: String): String = s"$stateRoot/admitted"
}
