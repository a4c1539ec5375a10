package graft.index

import graft.functions.VectorF
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: MLlib KMeans coarse quantizer →
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
      assign: DataFrame, idCol: String, vecCol: String) {

    def nearestClusters(v: Array[Double], nprobe: Int): Seq[Int] =
      centroids.map { case (cid, c) =>
        var s = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - c(i); s += d * d; i += 1 }
        (cid, s)
      }.sortBy { case (cid, d) => (d, cid) }.take(nprobe).map(_._1).toSeq

    /** Batch search: probe nprobe clusters per query, exact-rank top-k.
      * `idCol` must be integral (rides the top-k heap as long, cast back
      * on output — see GannIndex.requireIntegralId). */
    def search(queries: DataFrame, qid: String, qvec: String,
        k: Int, nprobe: Int): DataFrame = {
      val idType = GannIndex.requireIntegralId(assign, idCol)
      val spark = queries.sparkSession
      val bc = spark.sparkContext.broadcast(centroids)
      val np = nprobe
      val probeUdf = udf { (v: Seq[Double]) =>
        val cs = bc.value
        val arr = v.toArray
        cs.map { case (cid, c) =>
          var s = 0.0; var i = 0
          while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
          (cid, s)
        }.sortBy { case (cid, d) => (d, cid) }.take(np).map(_._1).toSeq
      }
      val probed = queries.select(col(qid), col(qvec),
        explode(probeUdf(col(qvec).cast("array<double>"))).as("cluster"))
      // bounded-heap top-k (TopKAgg): map-side partial aggregation ships
      // ≤k pairs per partition per query — no per-id dedup needed here,
      // every vector lives in exactly one posting list
      probed.join(assign, Seq("cluster"))
        .filter(col(idCol) =!= col(qid))
        .select(col(qid), col(idCol),
          VectorF.l2Dist(col(qvec), col(vecCol)).as("dist"))
        .groupBy(col(qid))
        .agg(graft.functions.TopKAgg.topK(col("dist"), col(idCol).cast("long"), k).as("top"))
        .select(col(qid), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col(qid), col("s.id").cast(idType).as(idCol),
          col("s.dist").as("dist"), (col("pos") + 1).cast("int").as("rnk"))
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
    val bc = df.sparkSession.sparkContext.broadcast(model.centroids)
    val assignUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      var best = 0; var bd = Double.MaxValue
      bc.value.foreach { case (cid, c) =>
        var s = 0.0; var i = 0
        while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
        if (s < bd || (s == bd && cid < best)) { bd = s; best = cid }
      }
      best
    }
    val newAssign = df
      .select(col(model.idCol), col(model.vecCol))
      .withColumn("cluster", assignUdf(col(model.vecCol).cast("array<double>")))
      .select(model.assign.columns.map(col).toIndexedSeq: _*)
    model.copy(assign =
      graft.core.Caches.cached(model.assign.union(newAssign)))
  }

  /** Persist centroids + cluster-partitioned posting lists (the IVF twin
    * of GannIndex.save — probes prune to nprobe partitions). */
  def save(model: Model, path: String): Unit = {
    val spark = model.assign.sparkSession
    import spark.implicits._
    model.centroids.toSeq.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    model.assign.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$path/assign")
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String): Model = {
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Model(centroids, spark.read.parquet(s"$path/assign"), idCol, vecCol)
  }

  /** Train the coarse quantizer (seeded → deterministic) and assign every
    * vector to its cluster. The quantizer fits on a bounded sample
    * (`fitSample` rows) — at 100 TB the centroids converge on a fraction
    * of the data (the reference's VC-bound subsampling idea,
    * radient/tasks/sinks/local/_gkmeans.py:26-36); the full table is only
    * touched by the single assignment pass. */
  def build(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, seed: Long = 42L, fitSample: Int = 100000): Model = {
    val feat = df.select(col(idCol), col(vecCol))
      .withColumn("features", array_to_vector(col(vecCol).cast("array<double>")))
    val n = feat.count()
    if (n == 0) // MLlib KMeans.fit rejects an empty dataset
      return Model(Array.empty,
        df.select(col(idCol), col(vecCol)).withColumn("cluster", lit(0)),
        idCol, vecCol)
    val fitSet =
      if (n <= fitSample) feat
      else feat.sample(withReplacement = false, fitSample.toDouble / n, seed)
    // 8 Lloyd rounds instead of 20: each KMeans iteration is a sequential
    // Spark job, and a coarse quantizer doesn't need a converged
    // clustering — it needs roughly-even posting lists (recall floor
    // pinned in AnnRecallSpec; the exact re-rank inside probed clusters
    // absorbs centroid noise). k-means|| init stays: random init dropped
    // recall@10 below the 0.7 floor (0.635) on the embeddings table.
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val model = km.fit(fitSet)
    // cached (tracked): the index is build-once / search-many, and every
    // search equi-joins the posting lists — uncached, each probe would
    // re-run the scan + KMeans transform. At 100 TB the same role is
    // played by save()'s cluster-partitioned parquet layout.
    val assign = graft.core.Caches.cached(
      model.transform(feat)
        .select(col(idCol), col(vecCol), col("cluster")))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    Model(centroids, assign, idCol, vecCol)
  }
}
