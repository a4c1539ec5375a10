package graft.sink

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet corpus directories — the at-rest
  * maintenance pass every continuously-ingested dataset needs: a
  * landing-dir ingest loop (the reference's IngestSource contract,
  * radient/tasks/sources/ingest.py:7-18) and per-micro-batch sinks
  * (radient/tasks/sinks/milvus.py:83's batched inserts; this engine's
  * streaming parquet sinks) both deposit one small file per trigger, and
  * at 100 TB the resulting footer/open overhead dominates scans long
  * before the data does (a 128 MB-split scan over 10⁶ × 1 MB files pays
  * 10⁶ task setups for work 10⁴ splits should carry).
  *
  * The pass is deliberately non-destructive: it rewrites `inDir` into
  * `outDir` at ~`targetBytes` per file and the CALLER publishes the swap
  * once the rewrite commits — the same write-then-publish discipline as
  * the bucketed snapshot tables (VectorTable.writeBucketed), so a
  * mid-compaction failure leaves the live dataset untouched.
  *
  * Scale shape: file sizes come from the Hadoop FileSystem listing (the
  * same API a cluster store serves), the planned file count is
  * ⌈bytes / target⌉, and the rewrite is a `coalesce` — a NARROW
  * dependency that concatenates scan splits without a shuffle, which is
  * all compaction needs (row order within a file is free). When the
  * dataset is already at or below the planned file count the frame is
  * written as scanned — never a repartition: paying a full shuffle of
  * the corpus to round file sizes is the classic compaction mistake.
  */
object Compaction {

  /** ⌈bytes / targetBytes⌉, min 1 — the planned output file count. */
  def planFiles(bytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` at
    * ~`targetBytes` per file. Returns (inputDataFiles, outputDataFiles).
    * Content is preserved as a multiset (CompactionSpec pins equality);
    * `outDir` is overwritten. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Int, Int) = {
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place compaction would destroy the only copy: the overwrite
    // write deletes outDir BEFORE the lazy scan of inDir runs, so
    // inDir == outDir turns the non-destructive rewrite into data loss.
    // Compare fully-qualified, dot-segment-normalized URIs so "x",
    // "./x", "a/./x" and "file:/.../x" spellings of the same dir are
    // all caught (Hadoop Path normalizes "//" but keeps "." segments).
    def canon(p: String) = fs.makeQualified(
      new org.apache.hadoop.fs.Path(p)).toUri.normalize()
    require(canon(inDir) != canon(outDir),
      s"compactParquet: inDir and outDir resolve to the same location " +
        s"($inDir); compaction is write-then-publish — rewrite into a " +
        "staging dir and swap after the rewrite commits")
    val parts = fs.listStatus(inPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val n = planFiles(bytes, targetBytes)
    val df = spark.read.parquet(inDir)
    val scanParts = df.rdd.getNumPartitions
    val out = if (scanParts > n) df.coalesce(n) else df
    out.write.mode("overwrite").parquet(outDir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val written = fs.listStatus(outPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (parts.length, written)
  }
}
