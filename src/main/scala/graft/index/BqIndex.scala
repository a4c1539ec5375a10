package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BQ (binary-quantization) ANN index — the 1-bit member of the
  * compression tier (64x): every vector is stored as ceil(dim/64) longs
  * of per-dimension threshold sign bits, the modern "binary sketch +
  * exact rerank" serving layout (the SPANN/RaBitQ-family 1-bit tier; the
  * reference stores raw float32, radient/tasks/sinks/local/gann.py:196-216).
  *
  * Thresholds are the per-dimension MEANS of a spread fit sample
  * ([[IvfIndex.hashSample]]) — sign-of-centered-value splits each
  * dimension near its median mass, where raw sign bits waste whole
  * dimensions on biased data. Encode is one narrow pass; the codes table
  * is the only distributed state.
  *
  * Search: encode the query once against the broadcast thresholds, rank
  * by Hamming distance (XOR + popcount over the packed longs — codegen
  * bit_count; the word fold is over dim/64 elements, e.g. ONE for 64-d)
  * through the bounded-heap [[graft.functions.TopKAgg]], then exact
  * rerank of the shortlist against the raw vectors by id equi-join —
  * the same two-stage shape as [[PqIndex.Model.searchRerank]].
  *
  * Scale: thresholds are dim doubles broadcast; codes are 64x smaller
  * than the vectors; the heap ships ≤k rows per partition per query;
  * the rerank reads shortlist·|queries| raw rows by id. Inserts append
  * against FROZEN thresholds through [[Compact.append]] like the other
  * three indexes.
  */
object BqIndex {

  /** Σ_w popcount(a_w xor b_w) over the packed signature words — the
    * codegen'd [[graft.functions.HammingWords]] kernel (primitive
    * XOR+POPCNT loop inside whole-stage codegen; an aggregate∘zip_with
    * fold would dispatch an interpreted lambda per word). */
  private def hamming(a: Column, b: Column): Column =
    graft.functions.VectorF.hammingWords(a, b)

  private[index] def encodeOne(v: IndexedSeq[Double],
      thresholds: Array[Double]): Array[Long] = {
    val words = new Array[Long]((thresholds.length + 63) / 64)
    var i = 0
    while (i < thresholds.length) {
      if (v(i) > thresholds(i)) words(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    words
  }

  final case class Model(thresholds: Array[Double], codes: DataFrame,
      idCol: String, appends: Int = 0) {

    private def encoded(queries: DataFrame, qid: String, qvec: String) = {
      val bc = queries.sparkSession.sparkContext.broadcast(thresholds)
      val encUdf = udf { (v: Seq[Double]) => encodeOne(v.toIndexedSeq, bc.value).toSeq }
      queries.select(col(qid), encUdf(col(qvec).cast("array<double>")).as("qsig"))
    }

    /** Hamming top-k over the packed codes (coarse stage). */
    def search(queries: DataFrame, qid: String, qvec: String, k: Int): DataFrame = {
      val idType = GannIndex.requireIntegralId(codes, idCol)
      codes.crossJoin(broadcast(encoded(queries, qid, qvec)))
        .filter(col(idCol) =!= col(qid))
        .select(col(qid), col(idCol),
          hamming(col("sig"), col("qsig")).cast("double").as("dist"))
        .groupBy(col(qid))
        .agg(graft.functions.TopKAgg.topK(col("dist"), col(idCol).cast("long"), k).as("top"))
        .select(col(qid), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col(qid), col("s.id").cast(idType).as(idCol),
          col("s.dist").as("dist"), (col("pos") + 1).cast("int").as("rnk"))
    }

    /** Hamming shortlist + exact L2 rerank against the raw vectors (the
      * serving shape — see PqIndex.Model.searchRerank). */
    def searchRerank(queries: DataFrame, qid: String, qvec: String, k: Int,
        shortlist: Int, vectors: DataFrame, vecCol: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val idType = GannIndex.requireIntegralId(codes, idCol)
      val cand = search(queries, qid, qvec, k = shortlist)
        .select(col(qid), col(idCol))
      val w = Window.partitionBy(col(qid)).orderBy(col("dist"), col(idCol))
      cand
        .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
        .join(queries.select(col(qid), col(qvec)), Seq(qid))
        .select(col(qid), col(idCol),
          graft.functions.VectorF.l2Dist(col(vecCol), col(qvec)).as("dist"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col(qid), col(idCol).cast(idType).as(idCol), col("dist"), col("rnk"))
    }
  }

  /** Incremental insert with FROZEN thresholds (the BQ member of the
    * insert family): encode the new vectors, append through
    * [[Compact.append]]. */
  def insert(model: Model, df: DataFrame, vecCol: String): Model = {
    val bc = df.sparkSession.sparkContext.broadcast(model.thresholds)
    val encUdf = udf { (v: Seq[Double]) => encodeOne(v.toIndexedSeq, bc.value).toSeq }
    val newCodes = df
      .select(col(model.idCol), encUdf(col(vecCol).cast("array<double>")).as("sig"))
      .select(model.codes.columns.map(col).toIndexedSeq: _*)
    model.copy(
      codes = Compact.append(model.codes, newCodes, model.appends),
      appends = model.appends + 1)
  }

  def save(model: Model, path: String): Unit = {
    val spark = model.codes.sparkSession
    import spark.implicits._
    model.thresholds.toSeq.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("dim", "threshold")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/thresholds")
    model.codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  def load(spark: SparkSession, path: String, idCol: String): Model = {
    val thresholds = spark.read.parquet(s"$path/thresholds").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    Model(thresholds, spark.read.parquet(s"$path/codes"), idCol)
  }

  /** Fit per-dimension mean thresholds on a spread sample (deterministic:
    * sequential fold over the hash-ordered sample) and encode every
    * vector in one distributed pass. */
  def build(df: DataFrame, idCol: String, vecCol: String,
      fitSample: Int = 4096): Model = {
    val sample = IvfIndex.hashSample(df, idCol,
      col(vecCol).cast("array<double>"), fitSample)
    require(sample.nonEmpty, "BqIndex.build: empty input")
    val dim = sample(0).length
    val sums = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { sums(i) += v(i); i += 1 }
    }
    val thresholds = sums.map(_ / sample.length)
    val bc = df.sparkSession.sparkContext.broadcast(thresholds)
    val encUdf = udf { (v: Seq[Double]) => encodeOne(v.toIndexedSeq, bc.value).toSeq }
    val codes = graft.core.Caches.cached(
      df.select(col(idCol), encUdf(col(vecCol).cast("array<double>")).as("sig")))
    Model(thresholds, codes, idCol)
  }
}
