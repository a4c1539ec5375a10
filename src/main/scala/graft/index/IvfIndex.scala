package graft.index

import graft.functions.VectorF
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: seeded k-means++ coarse quantizer →
  * cluster-partitioned posting lists → nprobe-nearest-centroid probe →
  * exact re-rank inside the probed clusters.
  *
  * This is the scale path for similarity search (SURVEY.md §4.3): the
  * posting-list table is partitioned by `cluster`, so a probe reads
  * nprobe/k of the data; the centroid table is tiny and broadcast. The
  * brute-force path (VectorSearch.q_knn_*) is the recall oracle.
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])],
      assign: DataFrame, idCol: String, vecCol: String,
      appends: Int = 0, metric: String = "l2") {

    def nearestClusters(v: Array[Double], nprobe: Int): Seq[Int] =
      Coarse.nearestK(v, centroids, nprobe).map(centroids(_)._1).toSeq

    /** Batch search: probe nprobe clusters per query, exact-rank top-k.
      * `idCol` must be integral (rides the top-k heap as long, cast back
      * on output — see GannIndex.requireIntegralId). `excludeSelf`
      * follows the id-domain convention in [[Search.selfFilter]].
      *
      * `allowedIds` is the filtered-search contract (the reference's
      * Milvus `filter=` search kwarg, radient/tasks/sinks/milvus.py:122):
      * an id frame semi-joined onto the posting lists BEFORE the
      * distance fold, so the returned k are the true top-k of the
      * ALLOWED set within the probed clusters — pre-filter semantics,
      * never the post-filtered (and arbitrarily short) unfiltered
      * top-k. The semi join shuffles ids only; selectivity prunes the
      * distance work proportionally. */
    def search(queries: DataFrame, qid: String, qvec: String,
        k: Int, nprobe: Int, excludeSelf: Boolean = true,
        allowedIds: Option[DataFrame] = None): DataFrame = {
      val idType = GannIndex.requireIntegralId(assign, idCol)
      val spark = queries.sparkSession
      val bc = spark.sparkContext.broadcast(centroids)
      val np = nprobe
      val probeUdf = udf { (v: Seq[Double]) =>
        val cs = bc.value
        val arr = v.toArray
        Coarse.nearestK(arr, cs, np).map(cs(_)._1).toSeq
      }
      val qn = Search.prepVectors(
        queries.select(col(qid), col(qvec).cast("array<double>").as(qvec)),
        qvec, metric)
      val probed = qn.select(col(qid), col(qvec),
        explode(probeUdf(col(qvec))).as("cluster"))
      val base = allowedIds.fold(assign)(ids =>
        assign.join(ids.select(col(idCol)), Seq(idCol), "left_semi"))
      // bounded-heap top-k (TopKAgg): map-side partial aggregation ships
      // ≤k pairs per partition per query — no per-id dedup needed here,
      // every vector lives in exactly one posting list
      Search.topKOut(
        Search.selfFilter(probed.join(base, Seq("cluster")), idCol, qid,
            excludeSelf)
          .select(col(qid), col(idCol),
            VectorF.l2Dist(col(qvec), col(vecCol)).as("dist")),
        qid, idCol, idType, k)
    }
  }

  /** Incremental insert — the streaming-ingest half of the reference's
    * insert → index → search lifecycle (tasks/sinks/milvus.py:83 insert,
    * gann.py:196 insert-then-index): new vectors are assigned to the
    * FROZEN centroids (one broadcast-probe pass, no retrain — the coarse
    * quantizer is fit statistics, not per-row state) and appended to the
    * posting lists. Cluster balance drifts only as far as the data
    * does; rebuild when it matters. */
  def insert(model: Model, df: DataFrame): Model = {
    val newAssign = encodeWith(model, df)
    model.copy(
      assign = Compact.append(model.assign, newAssign, model.appends),
      appends = model.appends + 1)
  }

  /** Encode a batch against the FROZEN quantizer into assignment rows
    * with the model's column layout — shared by the in-memory insert and
    * the persisted block append ([[Blocks]]). */
  private[index] def encodeWith(model: Model, df: DataFrame): DataFrame =
    assignNearest(Search.prepVectors(df, model.vecCol, model.metric),
        model.centroids, model.idCol, model.vecCol)
      .select(model.assign.columns.map(col).toIndexedSeq: _*)

  /** Deterministic, storage-order-INDEPENDENT fit sample: the first n
    * rows in xxhash64(id) order — a spread sample at TakeOrdered cost
    * (orderBy+limit never materializes a full sort), where a bare
    * `.limit(n)` takes whole partitions in storage order and trains the
    * quantizer on however the corpus happens to be laid out (e.g. one
    * shard of a time-partitioned 100 TB table). Shared by the PQ / IVF-PQ
    * / balanced-IVF fits; storage-order independence is pinned in
    * FitSampleSpec. */
  private[index] def hashSample(df: DataFrame, idCol: String, vec: Column,
      n: Int): Array[Array[Double]] =
    df.select(vec.as("_v"), col(idCol).as("_id"))
      .orderBy(xxhash64(col("_id").cast("string")), col("_id"))
      .limit(n)
      .collect().map(_.getSeq[Double](0).toArray)

  /** One broadcast-probe pass: nearest frozen centroid per row. */
  private def assignNearest(df: DataFrame, centroids: Array[(Int, Array[Double])],
      idCol: String, vecCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf { (v: Seq[Double]) =>
      val cs = bc.value
      cs(Coarse.nearest1(v.toArray, cs))._1
    }
    df.select(col(idCol), col(vecCol))
      .withColumn("cluster", assignUdf(col(vecCol).cast("array<double>")))
  }

  /** Persist centroids + cluster-partitioned posting lists (the IVF twin
    * of GannIndex.save — probes prune to nprobe partitions). */
  def save(model: Model, path: String): Unit = {
    val spark = model.assign.sparkSession
    import spark.implicits._
    model.centroids.toSeq.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Blocks.writeMeta(spark, path, model.metric)
    model.assign.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$path/assign")
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String): Model = {
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Model(centroids, spark.read.parquet(s"$path/assign"), idCol, vecCol,
      metric = Blocks.readMetric(spark, path))
  }

  /** O(batch) persisted insert: encode the batch against the FROZEN
    * centroids and append it as new parquet files under the saved
    * index's assignment dir — no read, union, or rewrite of the
    * existing blocks (the distributed twin of the reference's flat
    * in-memory append, gann.py:216-220; contrast [[insert]] +
    * [[Compact.append]], whose per-insert materialization is O(corpus)).
    * Reload with [[load]] to search the grown index. */
  def appendToSaved(model: Model, path: String, df: DataFrame): Unit =
    encodeWith(model, df).write.mode("append")
      .partitionBy("cluster").parquet(s"$path/assign")

  /** IDEMPOTENT streaming block append — the IVF twin of
    * [[GannIndex.appendStreamBlock]]: the batch lands under a
    * batch-keyed directory with overwrite semantics, so foreachBatch's
    * at-least-once replays replace their own block (batchId is stable
    * across restarts via the checkpointed offset log). Unpartitioned
    * like the GANN block (cluster rides as a data column): with a
    * production √n coarse book a batch touches up to |batch| distinct
    * clusters, and the dynamic-partition commit of a small block into
    * that many dirs is overhead compaction exists to avoid — blocks are
    * batch-sized until [[graft.index.Blocks.compactStreamBlocks]] folds
    * them into the cluster-partitioned base. */
  def appendStreamBlock(model: Model, path: String, df: DataFrame,
      batchId: Long): Unit =
    encodeWith(model, df).write.mode("overwrite")
      .parquet(s"$path/assign_stream/batch=$batchId")

  /** Serving view of a stream-maintained IVF index: base posting lists
    * plus every [[appendStreamBlock]] batch, unioned at rest. */
  def loadServing(spark: SparkSession, path: String, idCol: String,
      vecCol: String): Model = {
    val base = load(spark, path, idCol, vecCol)
    Blocks.streamBlocks(spark, path, base.assign.columns) match {
      case Some(extra) => base.copy(assign = base.assign.unionByName(extra))
      case None => base
    }
  }

  /** Quantizer-DRIFT monitor for a stream-maintained IVF index: mean
    * distance to the assigned centroid, RESIDENT base vs STREAMED
    * blocks. Streamed rows are encoded by the FROZEN coarse quantizer,
    * so when the ingest distribution drifts the streamed rows land in
    * progressively worse-fitting clusters — this pair is the early
    * signal (streamed/resident ratio grows with drift magnitude long
    * before recall visibly decays; the measured curve is in SCALE.md's
    * ivf_drift row). One aggregate per side over the at-rest layout, no
    * search required. `streamed` is NaN when no stream blocks exist
    * (nothing has arrived — no drift to measure). */
  def servingDrift(spark: SparkSession, path: String,
      vecCol: String): (Double, Double) = {
    val cents = spark.read.parquet(s"$path/centroids")
    def meanDist(df: DataFrame): Double = {
      val r = df.join(broadcast(cents), Seq("cluster"))
        .agg(avg(VectorF.l2Dist(col(vecCol).cast("array<double>"),
          col("centroid"))))
        .head()
      if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
    }
    val resident = meanDist(spark.read.parquet(s"$path/assign"))
    val streamRoot = new org.apache.hadoop.fs.Path(s"$path/assign_stream")
    val fs = streamRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val streamed =
      if (!fs.exists(streamRoot)) Double.NaN
      else meanDist(spark.read.parquet(streamRoot.toString))
    (resident, streamed)
  }

  /** REFIT-AND-RE-ENCODE compaction — the maintenance verb that closes
    * the frozen-quantizer drift loop ([[servingDrift]] is the monitor,
    * this is the actuator): refit the coarse quantizer on the FULL
    * serving union (base ∪ streamed blocks), re-encode every row
    * against the fresh centroids, and swap the layout atomically —
    * centroids and cluster-partitioned assignment replaced, stream
    * blocks folded in and dropped. After the swap the streamed rows are
    * first-class residents of a quantizer that has seen them, restoring
    * the recall the frozen encode bleeds under distribution shift
    * (measured recovery in SCALE.md's ivf_drift row; IvfRefitSpec pins
    * layout + row preservation + post-refit drift collapse).
    *
    * Contract (same maintenance window as
    * [[Blocks.compactStreamBlocks]], which this subsumes): run ONLY
    * while the maintenance stream is stopped AND its checkpoint fully
    * committed — folded batch-idempotence dirs are gone afterwards, so
    * a replaying stream would re-append. The swap is write-staging then
    * delete-and-rename; on a real deployment the rename is a
    * table-format manifest commit, and the `refit_stage` dir survives a
    * crash for manual recovery. Cost: one bounded driver-side fit
    * sample + one full re-encode scan + one partitioned rewrite — the
    * same order as a plain compaction, which is why the refit rides the
    * compaction window instead of earning a separate one. */
  def refitCompact(spark: SparkSession, path: String, idCol: String,
      vecCol: String, seed: Long = 42L, fitSample: Int = 100000,
      balance: Boolean = false): Model = {
    import spark.implicits._
    val serving = loadServing(spark, path, idCol, vecCol)
    val k = math.max(serving.centroids.length, 1)
    val fresh = build(serving.assign.select(col(idCol), col(vecCol)),
      idCol, vecCol, k = k, seed = seed, fitSample = fitSample,
      balance = balance, metric = serving.metric)
    val staging = s"$path/refit_stage"
    fresh.centroids.toSeq.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$staging/centroids")
    // materializes the re-encoded union INTO staging before anything
    // live is deleted — the read side of this write still points at the
    // live dirs
    fresh.assign.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$staging/assign")
    fresh.assign.unpersist(false)
    val conf = spark.sparkContext.hadoopConfiguration
    def pth(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = pth(path).getFileSystem(conf)
    fs.delete(pth(s"$path/assign"), true)
    fs.delete(pth(s"$path/centroids"), true)
    fs.delete(pth(s"$path/assign_stream"), true)
    fs.rename(pth(s"$staging/assign"), pth(s"$path/assign"))
    fs.rename(pth(s"$staging/centroids"), pth(s"$path/centroids"))
    fs.delete(pth(staging), true)
    load(spark, path, idCol, vecCol)
  }

  /** Balance-aware Lloyd on the (driver-side) sample — the deterministic
    * twin of the reference's GKMeans size-decay objective
    * (radient/tasks/sinks/local/_gkmeans.py:165-175: loss =
    * Σ assigned d² + size_decay·Σ_c (size_c − n/k)², optimized there by
    * Adam on a soft assignment). Here each iteration assigns points
    * GREEDILY in a fixed order using the marginal cost of the same
    * objective — d² + decay·(2(size_c − n/k) + 1) — then recenters;
    * sequential and seeded, so the fit is reproducible bit-for-bit.
    * Returns size-penalized centroids; the full-table assignment stays
    * nearest-centroid (hard), exactly like the reference's
    * predict-after-fit. */
  private[index] def balancedLloyd(pts: Array[Array[Double]], k: Int,
      iters: Int, seed: Long, sizeDecay: Double): Array[Array[Double]] = {
    val dim = pts(0).length
    val mu = pts.length.toDouble / k
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(pts.indices.toVector).take(math.min(k, pts.length))
    var cents = init.map(i => pts(i).clone()).toArray
    var it = 0
    while (it < iters) {
      val sizes = new Array[Double](cents.length)
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnts = new Array[Long](cents.length)
      pts.foreach { p =>
        var best = 0; var bc = Double.MaxValue; var c = 0
        while (c < cents.length) {
          var d2 = 0.0; var j = 0
          while (j < dim) { val d = p(j) - cents(c)(j); d2 += d * d; j += 1 }
          val cost = d2 + sizeDecay * (2.0 * (sizes(c) - mu) + 1.0)
          if (cost < bc) { bc = cost; best = c }
          c += 1
        }
        sizes(best) += 1.0
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        cnts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (cnts(c) == 0) cents(c) else sums(c).map(_ / cnts(c))
      }.toArray
      it += 1
    }
    cents
  }

  /** Seeded k-means++ init over the driver-side sample: D²-weighted
    * sequential sampling — deterministic given the canonical
    * hash-ordered sample, and (unlike MLlib's k-means||, whose
    * per-partition aggregation makes the init depend on the session's
    * parallelism) bit-identical at any partition count. */
  private[index] def kppInit(pts: Array[Array[Double]], k: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, pts.length)
    val cents = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    cents += pts(rnd.nextInt(pts.length)).clone()
    val d2 = Array.fill(pts.length)(Double.MaxValue)
    while (cents.length < kk) {
      val c = cents.last
      var i = 0
      while (i < pts.length) {
        val p = pts(i)
        var s = 0.0; var j = 0
        while (j < p.length) { val d = p(j) - c(j); s += d * d; j += 1 }
        if (s < d2(i)) d2(i) = s
        i += 1
      }
      val tot = d2.sum
      if (tot <= 0) cents += pts(rnd.nextInt(pts.length)).clone()
      else {
        var r = rnd.nextDouble() * tot
        var idx = 0
        while (idx < pts.length - 1 && r > d2(idx)) { r -= d2(idx); idx += 1 }
        cents += pts(idx).clone()
      }
    }
    cents.toArray
  }

  /** Plain Lloyd on the driver-side sample from a given init —
    * sequential, so the fit is reproducible bit-for-bit. */
  private[index] def lloyd(pts: Array[Array[Double]],
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val dim = pts(0).length
    var cents = init
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnts = new Array[Long](cents.length)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cents.length) {
          var s = 0.0; var j = 0
          while (j < dim) { val d = p(j) - cents(c)(j); s += d * d; j += 1 }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        cnts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (cnts(c) == 0) cents(c) else sums(c).map(_ / cnts(c))
      }.toArray
      it += 1
    }
    cents
  }

  /** Recall-relevant fit score for multi-start selection: over a bounded
    * pseudo-query subset of the sample, the fraction of each query's
    * exact top-10 neighbours (within a bounded candidate subset) that
    * fall inside the query's `nprobe` nearest clusters — i.e. the
    * sample-level estimate of exactly the number IVF probe recall
    * measures. Quantization error (Σ min-d²) is the WRONG criterion
    * here: fits with near-identical error differ by 5-10 recall points
    * depending on how neighbourhoods straddle cluster boundaries, and
    * minimizing error picks among them blindly. Deterministic
    * (hash-ordered sample prefixes, sequential arithmetic). */
  private[index] def probeScore(sample: Array[Array[Double]],
      cents: Array[Array[Double]], nprobe: Int): Double = {
    val nq = math.min(200, sample.length)
    val nc = math.min(2000, sample.length)
    val dim = sample(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < dim) { val d = a(j) - b(j); s += d * d; j += 1 }
      s
    }
    val assign = (0 until nc).map(i =>
      cents.indices.minBy(c => d2(sample(i), cents(c)))).toArray
    var hit = 0; var tot = 0
    var qi = 0
    while (qi < nq) {
      val q = sample(qi)
      val probed = cents.indices.sortBy(c => d2(q, cents(c)))
        .take(math.min(nprobe, cents.length)).toSet
      val top = (0 until nc).filter(_ != qi)
        .sortBy(i => d2(q, sample(i))).take(10)
      top.foreach { i => if (probed(assign(i))) hit += 1; tot += 1 }
      qi += 1
    }
    if (tot == 0) 1.0 else hit.toDouble / tot
  }

  /** Train the coarse quantizer (seeded → deterministic) and assign every
    * vector to its cluster. The quantizer fits DRIVER-SIDE on a bounded
    * sample (`fitSample` rows; ≤100k × dim doubles ≈ tens of MB) — at
    * 100 TB the centroids converge on a fraction of the data (the
    * reference's VC-bound subsampling idea,
    * radient/tasks/sinks/local/_gkmeans.py:26-36); the full table is only
    * touched by the single distributed assignment pass. The fit is
    * 8 seeded multi-starts of k-means++ + 12 Lloyd rounds over the
    * hash-ordered sample (probe-recall-selected):
    * bit-deterministic AND partition-count independent, where the MLlib
    * KMeans it replaces gave a different quantizer (and a different
    * measured recall, 0.716 vs 0.825 at sf0.1) depending on `local[N]`.
    * A coarse quantizer doesn't need a converged clustering — it needs
    * roughly-even posting lists (recall floor pinned in AnnRecallSpec;
    * the exact re-rank inside probed clusters absorbs centroid noise).
    * With `balance = true` the quantizer is the GKMeans-parity
    * size-penalized fit ([[balancedLloyd]]) instead. */
  def build(df0: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, seed: Long = 42L, fitSample: Int = 100000,
      balance: Boolean = false, sizeDecay: Double = 1.0,
      metric: String = "l2"): Model = {
    Search.checkMetric(metric)
    val df = Search.prepVectors(df0, vecCol, metric)
    if (balance) {
      val sample = hashSample(df, idCol,
        col(vecCol).cast("array<double>"), fitSample)
      if (sample.isEmpty)
        return Model(Array.empty,
          df.select(col(idCol), col(vecCol)).withColumn("cluster", lit(0)),
          idCol, vecCol, metric = metric)
      // multi-start over a few init seeds, keep the fit with the lowest
      // quantization error (Σ min-d² over the sample — the part of the
      // GKMeans objective that drives recall; balance is enforced inside
      // each fit's greedy assignment). Deterministic, sample-order
      // independent given the canonical hash-ordered sample, and the fit
      // runs on a bounded driver-side sample so 3x cost is trivial.
      val cents = Seq(seed, seed + 1, seed + 2).map { s0 =>
        val c = balancedLloyd(sample, k, iters = 8, seed = s0,
          sizeDecay = sizeDecay)
        val err = sample.map { p =>
          c.map { cc =>
            var s = 0.0; var j = 0
            while (j < p.length) { val d = p(j) - cc(j); s += d * d; j += 1 }
            s
          }.min
        }.sum
        (err, c)
      }.minBy(_._1)._2
      val centroids = cents.zipWithIndex.map { case (c, i) => (i, c) }
      val assign = graft.core.Caches.cached(
        assignNearest(df, centroids, idCol, vecCol))
      return Model(centroids, assign, idCol, vecCol, metric = metric)
    }
    val sample = hashSample(df, idCol,
      col(vecCol).cast("array<double>"), fitSample)
    if (sample.isEmpty)
      return Model(Array.empty,
        df.select(col(idCol), col(vecCol)).withColumn("cluster", lit(0)),
        idCol, vecCol, metric = metric)
    // Multi-start k-means++ + Lloyd, keep the fit with the HIGHEST
    // probe-recall score ([[probeScore]] at 3k/8-width probes — the
    // criterion the index is actually graded on; see its scaladoc for
    // why quantization error picks wrong). The whole fit is driver-side
    // arithmetic over the bounded sample, no per-iteration Spark job, so
    // 8 starts cost ~a second even at the 100k sample cap. Seeded
    // k-means++ init: plain random init dropped recall@10 below the 0.7
    // floor (0.635) on the embeddings table; D²-weighted seeding
    // restores the spread. Ties broken by seed order → deterministic.
    val selNp = math.max(1, (3 * k) / 8)
    val cents = (seed to seed + 7).map { s0 =>
      val c = lloyd(sample, kppInit(sample, k, s0), iters = 12)
      (probeScore(sample, c, selNp), c)
    }.maxBy(_._1)._2
    val centroids = cents.zipWithIndex.map { case (c, i) => (i, c) }
    // cached (tracked): the index is build-once / search-many, and every
    // search equi-joins the posting lists — uncached, each probe would
    // re-run the scan + assignment. At 100 TB the same role is played by
    // save()'s cluster-partitioned parquet layout.
    val assign = graft.core.Caches.cached(
      assignNearest(df, centroids, idCol, vecCol))
    Model(centroids, assign, idCol, vecCol, metric = metric)
  }
}
