package graft.index

import graft.functions.{TopKAgg, VectorF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Shared search-side plumbing for the six-index compression tier
  * (GANN / IVF / PQ / IVF-PQ / BQ / IVF-BQ): the bounded-heap top-k
  * output shape, the exact-rerank stage, the optional self-exclusion
  * filter, and the l2/cosine metric prep.
  *
  * Metric semantics (reference: radient's GKMeans supports
  * euclidean/cosine/lp, radient/tasks/sinks/local/_gkmeans.py:125-133,
  * and the Milvus sink's metric_type, tasks/sinks/milvus.py:122):
  * cosine is implemented as L2 over unit-normalized vectors —
  * ||u−v||² = 2·(1−cosθ) on unit vectors, so L2 ranking on the
  * normalized space IS cosine ranking, and every L2 kernel (codegen
  * l2Dist, ADC tables, sign codes) is reused unchanged. Build
  * normalizes the corpus once at encode time; search normalizes the
  * query batch; reported `dist` is the L2 distance in the normalized
  * space (monotone in cosine distance; convert via cos = 1 − dist²/2).
  */
private[index] object Search {

  val Metrics = Set("l2", "cosine")

  def checkMetric(metric: String): Unit =
    require(Metrics.contains(metric),
      s"unsupported metric '$metric' (expected one of ${Metrics.mkString("/")})")

  /** Corpus-side prep: unit-normalize the vector column for cosine,
    * pass through for l2 (the l2 path stays byte-identical to the
    * pre-metric behavior). */
  def prepVectors(df: DataFrame, vecCol: String, metric: String): DataFrame =
    if (metric == "cosine")
      df.withColumn(vecCol,
        VectorF.normalize(col(vecCol).cast("array<double>")))
    else df

  /** PRE-FILTER semantics for filtered ANN search — the reference's
    * only search kwarg (radient/tasks/sinks/milvus.py:122-127) extended
    * to every index tier (round 14; IVF and GANN grew it in rounds
    * 11-12): semi-join the codes/posting table down to the allowed ids
    * BEFORE the distance fold, so the returned k are the true top-k of
    * the ALLOWED set — never the post-filtered (and arbitrarily short)
    * unfiltered top-k. The semi join ships ids only; selectivity prunes
    * the distance work proportionally. */
  def allowedOnly(table: DataFrame, idCol: String,
      allowedIds: Option[DataFrame]): DataFrame =
    allowedIds.fold(table)(ids =>
      table.join(ids.select(col(idCol)), Seq(idCol), "left_semi"))

  /** Self-exclusion: the id-domain convention of the self-kNN query
    * entries (qid and idCol share the corpus id space, so a query's own
    * row is dropped from its candidates). For an EXTERNAL query batch
    * whose qids are unrelated to corpus ids, pass excludeSelf = false —
    * a colliding qid would otherwise silently lose its true nearest
    * neighbor. The reference ranks every candidate and has no such
    * exclusion (gann.c:999-1080). */
  def selfFilter(cand: DataFrame, idCol: String, qid: String,
      excludeSelf: Boolean): DataFrame =
    if (excludeSelf) cand.filter(col(idCol) =!= col(qid)) else cand

  /** (qid, idCol, dist) candidates → per-query top-k rows
    * (qid, idCol, dist, rnk): bounded-heap TopKAgg (≤k pairs per
    * partition per query reach the final shuffle), posexplode, id cast
    * back to its input type. */
  def topKOut(cand: DataFrame, qid: String, idCol: String,
      idType: DataType, k: Int): DataFrame =
    cand.groupBy(col(qid))
      .agg(TopKAgg.topK(col("dist"), col(idCol).cast("long"), k).as("top"))
      .select(col(qid), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col(qid), col("s.id").cast(idType).as(idCol),
        col("s.dist").as("dist"), (col("pos") + 1).cast("int").as("rnk"))

  /** Exact re-rank of a (qid, idCol) shortlist against the raw vectors
    * — the second stage of every compressed search (ADC/Hamming
    * shortlist absorbs the scan compression, this stage absorbs the
    * quantization error). Only shortlist·|queries| raw rows are read,
    * via the id equi-join.
    *
    * The two vector columns are aliased to internal names before the
    * joins, so a caller whose query-vector column shares the corpus
    * vector column's name (both "embedding", say) resolves cleanly
    * instead of throwing an ambiguous-reference AnalysisException. */
  def rerank(cand: DataFrame, queries: DataFrame, qid: String, qvec: String,
      k: Int, vectors: DataFrame, idCol: String, vecCol: String,
      idType: DataType, metric: String = "l2"): DataFrame = {
    val w = Window.partitionBy(col(qid)).orderBy(col("dist"), col(idCol))
    val v0 = vectors.select(col(idCol), col(vecCol).as("__graft_v"))
    val q0 = queries.select(col(qid), col(qvec).as("__graft_qv"))
    val v = prepVectors(v0, "__graft_v", metric)
    val q = prepVectors(q0, "__graft_qv", metric)
    cand.select(col(qid), col(idCol))
      .join(v, Seq(idCol))
      .join(q, Seq(qid))
      .select(col(qid), col(idCol),
        VectorF.l2Dist(col("__graft_v"), col("__graft_qv")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qid), col(idCol).cast(idType).as(idCol), col("dist"), col("rnk"))
  }
}

/** Driver/executor-side coarse-quantizer scans shared by the IVF family
  * (IvfIndex assign + probe, IvfPq / IvfBq probe + encode): bounded
  * partial selection of the nprobe nearest centroids instead of a full
  * sort, and early-abandon partial distances — O(kCoarse·dim) worst
  * case like the naive scan, but the abandon check skips most of each
  * distance once a bound is known, which is the assign loop every
  * 100 TB build pays at realistic kCoarse (thousands). Results are
  * EXACTLY the naive scan's, including (distance, centroidId)
  * tie-breaking — pinned in CoarseScanSpec.
  */
private[index] object Coarse {

  /** Squared L2 with early abandon: returns the full distance, or any
    * value > bound once the partial sum STRICTLY exceeds `bound`
    * (strict, so equal-distance ties still compare on centroid id
    * exactly like the full sort). */
  private def dist2Bounded(v: Array[Double], c: Array[Double],
      bound: Double): Double = {
    var s = 0.0; var i = 0
    val n = v.length
    while (i < n && s <= bound) {
      val d = v(i) - c(i); s += d * d; i += 1
    }
    s
  }

  /** Position (index into `cents`) of the nearest centroid, ties to the
    * lowest centroid id — identical to
    * `cents.map(d2).sortBy((d, cid)).head`, with early abandon. Assumes
    * `cents` is sorted by centroid id (build emits it that way). */
  def nearest1(v: Array[Double], cents: Array[(Int, Array[Double])]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val d = dist2Bounded(v, cents(c)._2, bd)
      // strict improvement only: on a tie the earlier (lower-id) stays
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Positions of the `np` nearest centroids ordered by (distance, id)
    * — identical to `cents.map(d2).sortBy((d, cid)).take(np)`, via
    * bounded insertion into an np-sized window with early abandon
    * against the current worst. */
  def nearestK(v: Array[Double], cents: Array[(Int, Array[Double])],
      np: Int): Array[Int] = {
    val m = math.min(np, cents.length)
    if (m <= 0) return Array.empty
    val pos = new Array[Int](m)
    val ds = new Array[Double](m)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val bound = if (filled < m) Double.MaxValue else ds(m - 1)
      val d = dist2Bounded(v, cents(c)._2, bound)
      // admit if the window is open, or (d, id) beats the current worst;
      // equal distance to the worst loses — the incoming id is larger
      // (cents is id-sorted), matching the full sort's tie order
      if (filled < m || d < ds(m - 1)) {
        var i = math.min(filled, m - 1)
        while (i > 0 && ds(i - 1) > d) {
          ds(i) = ds(i - 1); pos(i) = pos(i - 1); i -= 1
        }
        ds(i) = d; pos(i) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    pos
  }
}
