package graft.vectorize

import graft.functions.{TextF, VectorF}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, featurized by modality-dispatched per-partition
  * decoders (the Spark twin of the reference's MultimodalVectorizer
  * dispatch, radient/tasks/vectorizers/multimodal.py:31-42, and of its
  * per-modality preprocess→vectorize→postprocess contract,
  * tasks/vectorizers/_base.py:90-101).
  *
  * The real model decode (PIL/librosa/ImageBind in the reference) is NOT
  * available offline — each decoder below is a clearly-marked
  * deterministic STUB with the same shape: bytes in, fixed-dim float
  * features out. The Spark-side plumbing is real: binary schema,
  * mapPartitions with per-partition decoder init (the LazyLocalRunner
  * pattern, radient/orchestrate/runners.py:49-60), unit-normalized output
  * rows, modality stamped into metadata (_base.py:99).
  */
object Multimodal {

  /** Canonical multimodal record schema (id, modality, data, path). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("data", BinaryType),
    StructField("path", StringType)))

  /** Decoder contract: the seam where a real model (ONNX session, JNI
    * codec) would plug in — initialized once per partition. */
  trait Decoder extends Serializable {
    def init(): Unit = ()
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB image decoder: byte-value histogram over `dim` buckets — stands
    * in for decode→resize→embed. Deterministic fake, NOT a real codec. */
  object StubImageDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = new Array[Float](dim)
      bytes.foreach(b => h((b & 0xff) % dim) += 1f)
      h
    }
  }

  /** STUB audio decoder: interprets bytes as int8 samples and emits
    * windowed energy moments — stands in for waveform decode→embed. */
  object StubAudioDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        val v = bytes(i).toFloat / 128f
        h(i % dim) += v * v
        i += 1
      }
      h
    }
  }

  /** STUB video decoder: frame-samples every `stride` bytes then applies
    * the image stub — stands in for demux→frame-grab (video_demux
    * semantics, radient/tasks/transforms/video_demux/default.py:23-61). */
  object StubVideoDecoder extends Decoder {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val stride = math.max(1, bytes.length / 16)
      StubImageDecoder.features(bytes.grouped(stride).map(_.head).toArray, dim)
    }
  }

  def decoderFor(modality: String): Decoder = modality match {
    case "image" => StubImageDecoder
    case "audio" => StubAudioDecoder
    case "video" => StubVideoDecoder
    case other => throw new IllegalArgumentException(s"no decoder for $other")
  }

  /** Featurize binary columns by modality: one mapPartitions pass,
    * decoder initialized per partition, unit-normalized `embedding` out.
    * Text rows are routed to the hash embedder (native expressions) and
    * unioned back — the per-modality branch-and-union plan from
    * SURVEY.md §2.3. */
  def featurize(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("modality", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val binary = df.filter(col("modality") =!= "text")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val featurized = binary.select("id", "modality", "data")
      .mapPartitions { rows =>
        // per-partition init (LazyLocalRunner pattern): decoders are
        // resolved once here, not per row
        val decoders = Map(
          "image" -> StubImageDecoder,
          "audio" -> StubAudioDecoder,
          "video" -> StubVideoDecoder)
        decoders.values.foreach(_.init())
        rows.map { r =>
          val m = r.getString(1)
          Row(r.getLong(0), m,
            decoders(m).features(r.getAs[Array[Byte]](2), dim).toSeq)
        }
      }(encoder)
    val text = df.filter(col("modality") === "text")
      .select(col("id"), col("modality"),
        HashEmbed.embed(col("data").cast("string"), dim).as("embedding"))
    featurized.union(text)
      .select(col("id"), col("modality"),
        VectorF.normalize(col("embedding")).cast("array<float>").as("embedding"))
  }

  /** Fixed-size binary page fan-out — the document-screenshot transform
    * shape (radient/tasks/transforms/document_screenshot/pymupdf.py:22-47:
    * one input document → one row per rendered page). The real PDF
    * renderer is not available offline, so a "page" is a deterministic
    * fixed-size byte slice of the payload; the Spark plumbing (binary
    * column in, `posexplode` fan-out, per-page binary out) is the real
    * contract, and TextAnalysis.q_doc_pages pins it with exact per-page
    * checksums. Empty payloads yield zero pages (guarded sequence, like
    * clipSplit). */
  def pageSplit(df: DataFrame, dataCol: String, pageBytes: Int): DataFrame = {
    val nPages =
      ceil(octet_length(col(dataCol)).cast("double") / pageBytes).cast("int")
    val idx = when(col("_np") > 0, sequence(lit(0), col("_np") - 1))
      .otherwise(array().cast("array<int>"))
    df.withColumn("_np", nPages)
      .select(col("*"),
        posexplode(transform(idx,
          i => col(dataCol).substr(i * pageBytes + 1, lit(pageBytes))))
          .as(Seq("page_idx", "page_data")))
      .drop("_np")
  }

  /** External-process decode seam — the ffmpeg-subprocess transform
    * pattern (radient/tasks/transforms/video_demux/ffmpeg.py:9-61: pipe
    * the payload into a codec process, read the demuxed frames back).
    * The payload is written from a separate thread so a large input can
    * never deadlock against a full stdout pipe; a non-zero exit fails
    * the task (and with it the Spark job) rather than silently yielding
    * truncated output. */
  final class SubprocessDecoder(cmd: Seq[String]) extends Serializable {
    def pipe(bytes: Array[Byte]): Array[Byte] = {
      val proc = new ProcessBuilder(cmd: _*).start()
      val writer = new Thread(() => {
        try { proc.getOutputStream.write(bytes); proc.getOutputStream.close() }
        catch { case _: java.io.IOException => () } // consumer exited early
      })
      writer.start()
      val out = proc.getInputStream.readAllBytes()
      writer.join()
      val rc = proc.waitFor()
      require(rc == 0, s"subprocess '${cmd.mkString(" ")}' exited $rc")
      out
    }
  }

  /** Demux each row's binary payload through an external command: one
    * output row per fixed-size frame of the subprocess output
    * (ffmpeg.py:9-61 semantics with the codec behind a seam — specs run
    * it with a trivial substitute binary). One decoder per partition
    * (LazyLocalRunner pattern); one process per payload, like the
    * reference's one ffmpeg invocation per video. */
  def subprocessDemux(df: DataFrame, cmd: Seq[String], frameBytes: Int,
      idCol: String = "id", dataCol: String = "data"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(dataCol).as("data"))
      .mapPartitions { rows =>
        val dec = new SubprocessDecoder(cmd) // per-partition init
        rows.flatMap { r =>
          dec.pipe(r.getAs[Array[Byte]](1)).grouped(frameBytes).zipWithIndex
            .map { case (f, i) => Row(r.getLong(0), i, f) }
        }
      }(encoder)
  }

  /** Interval clip-split of a samples column — the audio 2 s clip logic
    * (radient/tasks/vectorizers/audio/imagebind.py:41-51) and the demux
    * interval sampling, as a native flatMap: one row per clip. */
  def clipSplit(df: DataFrame, samplesCol: String, rateCol: String,
      clipSeconds: Double): DataFrame = {
    val clipLen = (col(rateCol).cast("double") * clipSeconds).cast("int")
    // guard: sequence(0, -1) is DESCENDING in Spark — an empty samples
    // array must yield zero clip rows, not two spurious empty clips
    val clipIdx = when(col("n_clips") > 0,
      sequence(lit(0), col("n_clips") - 1)).otherwise(array().cast("array<int>"))
    df.withColumn("n_clips",
      ceil(size(col(samplesCol)).cast("double") / clipLen).cast("int"))
      .select(col("*"),
        posexplode(transform(clipIdx,
          i => slice(col(samplesCol), i * clipLen + 1, clipLen)))
          .as(Seq("clip_idx", "clip")))
      .drop("n_clips", samplesCol)
  }
}

/** Deterministic hash-projection text embedder (the offline stand-in for
  * sbert, radient/tasks/vectorizers/text/sbert.py — same surface, signed
  * feature hashing instead of a transformer). */
object HashEmbed {
  import org.apache.spark.sql.Column

  /** Signed feature-hash embedding of a text column (unnormalized counts;
    * integer-exact, see TextAnalysis.q_embed_hash for the oracle twin).
    *
    * Evaluation shape: the (bucket, sign) pair is hashed ONCE per token
    * (two md5s) and tallied into a dim-slot accumulator. The earlier
    * per-position formulation rescanned the token list per output slot,
    * re-inlining both hashes dim× per token — 69 s at sf0.1 for the
    * multimodal featurize query. */
  def embed(text: Column, dim: Int): Column = {
    val pairs = transform(TextF.tokens(text), t =>
      struct(TextF.featureBucket(t, dim).as("b"), TextF.featureSign(t).as("s")))
    val acc = aggregate(pairs, array_repeat(lit(0L), dim),
      (a, p) => transform(a, (v, i) =>
        v + when(p.getField("b") === i.cast("long"), p.getField("s")).otherwise(0L)))
    transform(acc, v => v.cast("float"))
  }
}
