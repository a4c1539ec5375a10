package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source connectors — the Spark-native re-expression of the reference's
  * source family (radient/tasks/sources/): a string-keyed reader registry
  * mirroring `make_operator("source", ...)` (radient/factory.py:29-38).
  *
  *  - `local` (LocalSource parity, radient/tasks/sources/local.py:7-26:
  *    recursive directory walk yielding file payloads — and fixing its
  *    `read() -> None` bug): a recursive `binaryFile` scan returning
  *    (path, modificationTime, length, content). At 100 TB this is a
  *    distributed multi-split object-store listing + read, not a driver
  *    walk.
  *  - `ingest` (IngestSource parity, radient/tasks/sources/ingest.py:7-18,
  *    landing-directory pickup): same scan pointed at a landing dir; the
  *    continuous variant is `graft.streaming.Streams.readEvents`-style
  *    `readStream` file arrival.
  *  - `csv`/`json`/`parquet`/`text`: the formats the reference only
  *    touches via examples (drug_discovery.md reads CSV with the stdlib)
  *    — Spark built-ins with schema inference off by default at scale.
  */
object Sources {

  /** Recursive binary-file scan of a directory tree; `glob` filters file
    * names (e.g. "*.png"). */
  def local(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** One-shot landing-directory pickup (IngestSource parity). */
  def ingest(spark: SparkSession, landingDir: String): DataFrame =
    local(spark, landingDir)

  /** String-keyed reader registry (make_operator parity). */
  def reader(spark: SparkSession, format: String, path: String): DataFrame =
    format match {
      case "local" | "binary" => local(spark, path)
      case "ingest" => ingest(spark, path)
      case "parquet" => spark.read.parquet(path)
      case "orc" => spark.read.orc(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case "json" => spark.read.json(path)
      case "text" => spark.read.text(path)
      case other => throw new IllegalArgumentException(s"unknown source format $other")
    }

  /** Read semi-structured input (json/csv) in PERMISSIVE mode and split
    * it into (clean, quarantine): malformed records land — whole — in
    * the quarantine frame instead of killing the job (FAILFAST) or
    * silently vanishing (DROPMALFORMED). The shape every recurring
    * ingest needs at 100 TB: a crawl batch with 0.1% broken lines must
    * neither abort 99.9% good work nor lose the evidence of what broke.
    * Both frames derive from ONE scan (the corrupt-record column is
    * populated by the same parse), and the quarantine carries the raw
    * line for replay after a parser fix. `schema` is required — corrupt
    * -record routing is meaningless under inference, which silently
    * widens types to absorb damage instead of flagging it. */
  def readWithQuarantine(spark: SparkSession, format: String, path: String,
      schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    require(format == "json" || format == "csv",
      s"quarantine routing supports json/csv, got $format")
    val corruptCol = "_corrupt_record"
    // a caller schema already claiming the corrupt column would produce
    // a confusing duplicate-column failure deep in the reader — fail
    // loud at the API boundary instead
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not contain $corruptCol — readWithQuarantine adds it")
    val withCorrupt = schema.add(corruptCol,
      org.apache.spark.sql.types.StringType, nullable = true)
    val base = (format match {
      case "json" => spark.read.schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol).json(path)
      case _ => spark.read.schema(withCorrupt)
        .option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol).csv(path)
    })
    // tracked cache (released by Caches.clear in long-lived sessions);
    // required regardless: Spark refuses corrupt-column-only queries
    // over raw files, and both returned frames share the one scan
    val cached = graft.core.Caches.cached(base)
    val clean = cached.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = cached.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_record"))
    (clean, quarantine)
  }

  /** Stamp source metadata columns the way vectorizers stamp `data`/`type`
    * (radient/tasks/vectorizers/_base.py:99): path + inferred modality
    * from the file extension. */
  def withModality(files: DataFrame): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    files.withColumn("modality",
      when(ext.isin("png", "jpg", "jpeg", "bmp", "gif"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .when(ext.isin("txt", "md", "html"), "text")
        .otherwise("binary"))
  }
}
