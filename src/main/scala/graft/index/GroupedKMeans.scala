package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-grouped k-means — the reference's distinctive GKMeans mode
  * (radient/tasks/sinks/local/_gkmeans.py:177-196 `fit(groups=...)`:
  * "treating each group as an independent dataset", all groups trained
  * in one batched tensor op). Here every Lloyd iteration is ONE pair of
  * distributed jobs over ALL groups at once — assignment is a
  * broadcast-join argmin, the update is a (group, cluster, dim)
  * aggregate — so fitting 10⁶ per-key clusterings costs the same number
  * of Spark stages as fitting one (the batch dimension rides the
  * group-by keys, the reference's `groups.shape[0]` batch axis).
  *
  * Deterministic: seeds are the k lowest-`hash(vec)` rows per group,
  * assignment ties break to the lowest cluster id, means are exact
  * per-dimension averages — reproducible on any partitioning.
  */
object GroupedKMeans {

  /** Fit per-group centroids: returns (groupCol, cluster, centroid).
    * Groups with fewer than k rows get one centroid per distinct row. */
  def fit(df: DataFrame, groupCol: String, vecCol: String,
      k: Int, iters: Int = 8): DataFrame = {
    val pts = graft.core.Caches.cached(
      df.select(col(groupCol), col(vecCol).cast("array<double>").as("v"))
        // stable per-row key: value hash (+ row_number for exact dups)
        .withColumn("rid",
          row_number().over(Window.partitionBy(col(groupCol))
            .orderBy(hash(col("v")), col("v").cast("string")))))
    var cents = pts.filter(col("rid") <= k)
      .select(col(groupCol), (col("rid") - 1).cast("int").as("cluster"),
        col("v").as("centroid"))
    var it = 0
    while (it < iters) {
      // assignment: per row, nearest of ITS group's centroids
      val joined = pts.join(cents, Seq(groupCol))
        .select(col(groupCol), col("rid"), col("v"), col("cluster"),
          graft.functions.VectorF.l2Dist(col("v"), col("centroid")).as("d"))
      val assigned = joined
        .groupBy(col(groupCol), col("rid"))
        .agg(min(struct(col("d"), col("cluster"))).as("best"),
          first(col("v")).as("v"))
        .select(col(groupCol), col("best.cluster").as("cluster"), col("v"))
      // update: exact per-dimension mean per (group, cluster)
      cents = assigned
        .select(col(groupCol), col("cluster"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col(groupCol), col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col(groupCol), col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col(groupCol), col("cluster"),
          transform(col("pm"), e => e.getField("m")).as("centroid"))
      it += 1
    }
    cents
  }

  /** Hard-assign every row to its group's nearest fitted centroid:
    * one row per input row, (groupCol, vecCol, cluster, dist). */
  def assign(df: DataFrame, cents: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val d = df.select(col(groupCol), col(vecCol))
      .withColumn("__v", col(vecCol).cast("array<double>"))
      .withColumn("__rid",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(hash(col("__v")), col("__v").cast("string"))))
    d.join(cents, Seq(groupCol))
      .select(col(groupCol), col("__rid"), col(vecCol), col("cluster"),
        graft.functions.VectorF.l2Dist(col("__v"), col("centroid")).as("dist"))
      .groupBy(col(groupCol), col("__rid"))
      .agg(first(col(vecCol)).as(vecCol),
        min(struct(col("dist"), col("cluster"))).as("best"))
      .select(col(groupCol), col(vecCol),
        col("best.cluster").as("cluster"), col("best.dist").as("dist"))
  }
}
