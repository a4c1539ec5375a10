package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of the streaming-containment per-batch wall
  * (the round-13 `weak`): replays the LAST batch of a finished
  * ScaleStream state dir against the accumulated state and times each
  * term separately —
  *
  *   post-scan   — posting-state read alone (the bytes term)
  *   sh-scan     — shingle-set state read alone
  *   cand-raw    — the raw strategy's hash-count candidate aggregate
  *                 (the Σ_g df_state·df_batch fan-out term)
  *   cand-prefix — the prefix strategy's two-pass candidate cut
  *   full-raw / full-prefix — candidates + exact verify (the whole
  *                 admission core, output collected)
  *
  * Usage: sbt "Test/runMain graft.streaming.ContainProfile <stateDir>"
  * where stateDir is a graft_sst_ctstate* dir left by a ScaleStream
  * run (kinds post/sh with batch dirs 0..N; the probe treats batch N
  * as the arriving micro-batch).
  */
object ContainProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ContainProfile <stateDir>")
    val root = args.head
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shAll = spark.read.parquet(s"$root/sh")
    val lastBatch = shAll.agg(max(col("batch"))).collect()(0).getInt(0)
    println(s"[probe] state=$root lastBatch=$lastBatch (replaying it)")
    val d = shAll.filter(col("batch") === lastBatch)
      .select("doc_id", "sh", "nsh").cache()
    println(s"[probe] batch docs=${d.count()}")
    val post = spark.read.parquet(s"$root/post")
      .filter(col("batch") < lastBatch).select("doc_id", "g").cache()
    val psh = shAll.filter(col("batch") < lastBatch)
      .select("doc_id", "sh", "nsh").cache()

    def timed(name: String)(f: => Long): Unit = {
      val walls = (0 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"CONTAIN-TERM $name%-12s min=${walls.tail.map(_._1).min}%.3f s" +
        f" rows=${walls.head._2} (reps ${
          walls.tail.map(w => f"${w._1}%.2f").mkString(", ")})")
    }

    // un-cache for the scan terms: measure the read, not the cache hit
    post.unpersist(); psh.unpersist()
    timed("post-scan") { spark.read.parquet(s"$root/post")
      .filter(col("batch") < lastBatch).select("doc_id", "g").count() }
    timed("sh-scan") { shAll.filter(col("batch") < lastBatch)
      .select("doc_id", "sh", "nsh").count() }

    val bg = d.select(col("doc_id").as("new_id"), col("nsh").as("nn"),
      explode(transform(col("sh"), s => xxhash64(s))).as("g"))
    timed("hash-match") { post.join(broadcast(bg), Seq("g")).count() }
    timed("cand-raw") { post.select(col("doc_id").as("prev_id"), col("g"))
      .join(broadcast(bg), Seq("g"))
      .groupBy(col("prev_id"), col("new_id"), col("nn"))
      .agg(count(lit(1)).as("ns"))
      .filter(col("ns") * 5 >= col("nn").cast("long") * 4)
      .count() }
    timed("full-raw") {
      StreamDedup.containMatchedRaw(d, post, psh, 4, 5).count() }
    timed("full-prefix") {
      StreamDedup.containMatched(d, post, psh, 4, 5).count() }
    spark.stop()
  }
}
