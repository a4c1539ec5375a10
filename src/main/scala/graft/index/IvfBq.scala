package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-BQ: coarse inverted-file pruning over 1-bit residual codes — the
  * binary sibling of [[IvfPq]] (FAISS's `IVFx,...` with a binary fine
  * quantizer; the cheapest cluster-pruned layout). Composition of two
  * tested tiers:
  *
  *  - IVF coarse quantizer ([[IvfIndex]]): a probe touches nprobe/k of
  *    the corpus via the cluster-keyed posting lists;
  *  - BQ residual signatures ([[BqIndex]] kernels): each vector stores
  *    ceil(dim/64) longs of residual sign bits (threshold 0 per
  *    dimension — residuals are centered by construction, so the sign
  *    split lands near the median mass without a fitted threshold).
  *
  * Search probes the nprobe nearest clusters, encodes the query's
  * residual signature per probed cluster (tiny, in the probe UDF over
  * the broadcast centroids), ranks by the codegen'd
  * [[graft.functions.HammingWords]] XOR+POPCNT over only the probed
  * posting lists through the bounded-heap TopKAgg, and exact-reranks
  * the shortlist by id equi-join — identical serving shape to IVF-PQ at
  * 1 bit/dimension instead of ~1 byte/subspace.
  */
object IvfBq {

  final case class Model(coarse: Array[(Int, Array[Double])],
      codes: DataFrame, idCol: String, appends: Int = 0) {

    /** (cluster, residual signature) rows per query for the probed
      * clusters. */
    private def probed(queries: DataFrame, qid: String, qvec: String,
        nprobe: Int): DataFrame = {
      val bc = queries.sparkSession.sparkContext.broadcast(coarse)
      val np = nprobe
      val probeUdf = udf { (v: Seq[Double]) =>
        val arr = v.toArray
        bc.value.map { case (cid, c) =>
          var s = 0.0; var i = 0
          while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
          (cid, c, s)
        }.sortBy { case (cid, _, d) => (d, cid) }.take(np).map { case (cid, cent, _) =>
          val resid = IndexedSeq.tabulate(arr.length)(i => arr(i) - cent(i))
          (cid, BqIndex.encodeOne(resid, new Array[Double](arr.length)).toSeq)
        }.toSeq
      }
      queries.select(col(qid), explode(probeUdf(col(qvec).cast("array<double>"))).as("p"))
        .select(col(qid), col("p._1").as("cluster"), col("p._2").as("qsig"))
    }

    /** Hamming top-k over the probed clusters' residual signatures. */
    def search(queries: DataFrame, qid: String, qvec: String,
        k: Int, nprobe: Int): DataFrame = {
      val idType = GannIndex.requireIntegralId(codes, idCol)
      probed(queries, qid, qvec, nprobe).join(codes, Seq("cluster"))
        .filter(col(idCol) =!= col(qid))
        .select(col(qid), col(idCol),
          graft.functions.VectorF.hammingWords(col("sig"), col("qsig"))
            .cast("double").as("dist"))
        .groupBy(col(qid))
        .agg(graft.functions.TopKAgg.topK(col("dist"), col(idCol).cast("long"), k).as("top"))
        .select(col(qid), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col(qid), col("s.id").cast(idType).as(idCol),
          col("s.dist").as("dist"), (col("pos") + 1).cast("int").as("rnk"))
    }

    /** Hamming shortlist + exact rerank (the serving shape — see
      * PqIndex.Model.searchRerank). */
    def searchRerank(queries: DataFrame, qid: String, qvec: String, k: Int,
        nprobe: Int, shortlist: Int, vectors: DataFrame, vecCol: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val idType = GannIndex.requireIntegralId(codes, idCol)
      val cand = search(queries, qid, qvec, k = shortlist, nprobe = nprobe)
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

  /** One assign+encode pass against frozen centroids (shared by build
    * and insert). */
  private def encode(df: DataFrame, coarse: Array[(Int, Array[Double])],
      idCol: String, vecCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(coarse)
    val encUdf = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      var best = 0; var bd = Double.MaxValue
      var bestCent: Array[Double] = null
      bc.value.foreach { case (cid, c) =>
        var s = 0.0; var i = 0
        while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
        if (s < bd) { bd = s; best = cid; bestCent = c }
      }
      val resid = IndexedSeq.tabulate(arr.length)(i => arr(i) - bestCent(i))
      (best, BqIndex.encodeOne(resid, new Array[Double](arr.length)).toSeq)
    }
    df.select(col(idCol), encUdf(col(vecCol).cast("array<double>")).as("e"))
      .select(col(idCol), col("e._1").as("cluster"), col("e._2").as("sig"))
  }

  /** Incremental insert with FROZEN centroids (the IVF-BQ member of the
    * insert family). */
  def insert(model: Model, df: DataFrame, vecCol: String): Model = {
    val newCodes = encode(df, model.coarse, model.idCol, vecCol)
      .select(model.codes.columns.map(col).toIndexedSeq: _*)
    model.copy(
      codes = Compact.append(model.codes, newCodes, model.appends),
      appends = model.appends + 1)
  }

  /** Persist centroids + cluster-partitioned signatures (probes prune to
    * nprobe partitions, like IvfPq.save). */
  def save(model: Model, path: String): Unit = {
    val spark = model.codes.sparkSession
    import spark.implicits._
    model.coarse.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    model.codes.write.mode("overwrite")
      .partitionBy("cluster").parquet(s"$path/codes")
  }

  def load(spark: SparkSession, path: String, idCol: String): Model = {
    val coarse = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    Model(coarse, spark.read.parquet(s"$path/codes"), idCol)
  }

  /** Coarse-quantize (IvfIndex), then sign-encode the residuals in one
    * distributed pass off the IVF assignment (the cluster is already
    * known per row — no second nearest-centroid scan, the IvfPq.build
    * pattern). */
  def build(df: DataFrame, idCol: String, vecCol: String,
      kCoarse: Int = 8, seed: Long = 42L): Model = {
    val ivf = IvfIndex.build(df, idCol, vecCol, k = kCoarse, seed = seed)
    val byId = ivf.centroids.toMap
    val bc = df.sparkSession.sparkContext.broadcast(byId)
    val sigUdf = udf { (v: Seq[Double], cluster: Int) =>
      val cent = bc.value(cluster)
      val resid = IndexedSeq.tabulate(v.length)(i => v(i) - cent(i))
      BqIndex.encodeOne(resid, new Array[Double](v.length)).toSeq
    }
    val codes = graft.core.Caches.cached(
      ivf.assign.select(col(idCol), col("cluster"),
        sigUdf(col(vecCol).cast("array<double>"), col("cluster")).as("sig")))
    Model(ivf.centroids, codes, idCol)
  }
}
