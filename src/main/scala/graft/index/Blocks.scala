package graft.index

import org.apache.spark.sql.SparkSession

/** Persisted-index metadata + block-append conventions shared by the
  * six-index tier.
  *
  * Layout: every saved index is a directory of parquet tables (quantizer
  * metadata coalesced to one file; the codes/assignment table
  * partitioned for probe pruning) plus a one-row `meta` table holding
  * the distance metric. The persisted INSERT path
  * (`appendToSaved` on each index object) encodes a batch against the
  * frozen quantizer and writes it with `mode("append")` — parquet
  * append only ADDS files under the directory, so the cost of an insert
  * is O(batch) written rows and the existing blocks are never read or
  * rewritten (the reference's flat in-memory append, gann.py:216-220,
  * made durable; contrast the in-memory [[Compact.append]], which
  * re-materializes the cached union every insert). `load` then reads
  * the whole directory lazily — old blocks and appended blocks alike.
  * BlockAppendSpec pins: appended-index search ≡ in-memory-insert
  * search, and existing block files untouched by an append.
  */
object Blocks {

  /** Write the one-row metric table (idempotent overwrite). */
  def writeMeta(spark: SparkSession, path: String, metric: String): Unit = {
    import spark.implicits._
    Seq(metric).toDF("metric")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read the saved metric; "l2" for indexes saved before metrics
    * existed (their vectors were never normalized, which is exactly the
    * l2 encode). */
  def readMetric(spark: SparkSession, path: String): String =
    try spark.read.parquet(s"$path/meta").collect()(0).getString(0)
    catch { case _: org.apache.spark.sql.AnalysisException => "l2" }
}
