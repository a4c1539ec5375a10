package graft.sink

import graft.functions.VectorF
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector table sink + search entry — the Spark-native Milvus/GANN sink
  * surface (radient/tasks/sinks/milvus.py:83-127, `todict` row shape
  * vector.py:44-48): rows carry id, embedding, a precomputed `norm_sq`
  * (gann.c:832-841 — turns L2 into one dot product at query time), and
  * arbitrary metadata columns.
  *
  * Scale: written as parquet, optionally partitioned by a metadata column
  * (partition pruning for filtered searches) — at 100 TB this is the
  * posting-list layout; pair with graft.index.IvfIndex for cluster
  * partitioning.
  */
object VectorTable {

  /** Persist (id, embedding, norm_sq, metadata...) — `insert` parity. */
  def write(df: DataFrame, path: String, idCol: String, vecCol: String,
      partitionCol: Option[String] = None): Unit = {
    val out = df.withColumn("norm_sq", VectorF.normSq(col(vecCol)))
    val w = out.write.mode("overwrite")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist as a BUCKETED catalog table — the at-rest layout the
    * corpus-delta / dedup scaladocs assume: both crawls bucketed by the
    * id column into the SAME bucket count, so every id-equi-join
    * between them (snapshot delta, incremental batch-vs-corpus dedup,
    * decontamination probes) reads co-located buckets and the
    * corpus-sized Exchange disappears from the join plan entirely —
    * at 100 TB that is the difference between a metadata-sized read and
    * re-shuffling both crawls (BucketedLayoutSpec pins the no-Exchange
    * plan and result equality vs the shuffled path). Catalog-backed
    * because bucket metadata lives in the table catalog — Spark
    * refuses `bucketBy` on a bare path write; pass `path` to keep the
    * files external at a chosen location. `vecCol` stamps `norm_sq`
    * like [[write]]; None for plain document corpora — the layout
    * serves the dedup family as much as the vector sink. `sortBy` the
    * same id keeps bucket files locally sorted, so the downstream
    * sort-merge join sorts file-sized runs, never shuffles.
    * Reference: the sink owns collection layout the same way
    * (radient/tasks/sinks/milvus.py:60-65). */
  def writeBucketed(df: DataFrame, table: String, idCol: String,
      vecCol: Option[String] = None, buckets: Int = 8,
      path: Option[String] = None): Unit = {
    val out = vecCol.fold(df)(v =>
      df.withColumn("norm_sq", VectorF.normSq(col(v))))
    val w = out.write.mode("overwrite")
      .bucketBy(buckets, idCol).sortBy(idCol).format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** 60-bit md5 tag of a dataset dir for catalog table names — the
    * TextF.h60 discipline on the driver side. A 32-bit String.hashCode
    * collision between two dirs in one session would make the second
    * build overwrite the first's tables while the first memo kept
    * serving stale names (wrong results, no error); 15 hex chars puts a
    * same-session collision out of reach. */
  def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)

  /** Drop a managed table's catalog entry AND any orphaned managed
    * location a previous JVM left on disk — `saveAsTable` refuses to
    * overwrite a location the in-memory catalog doesn't know about, so
    * every memoized [[writeBucketed]] owner clears both before writing. */
  def dropWithLocation(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
  }

  /** Filtered exact top-k search — `search` parity
    * (milvus.py:122-127: query vector + limit + boolean filter expr).
    * Distance: "l2" or "cosine". The filter is a real Column predicate so
    * Catalyst pushes it into the scan (the reference forwards an opaque
    * string to Milvus; here pushdown is free). */
  def search(table: DataFrame, vecCol: String, query: Seq[Double], k: Int,
      metric: String = "l2", filter: Option[Column] = None): DataFrame = {
    val qLit = array(query.map(lit): _*)
    val filtered = filter.fold(table)(table.filter)
    val scored = metric match {
      case "l2" =>
        // ‖q‖² + ‖v‖² − 2q·v with the persisted norm (gann.c:1069)
        val qNormSq = query.map(x => x * x).sum
        filtered.withColumn("distance",
          sqrt(greatest(lit(qNormSq) + col("norm_sq")
            - lit(2.0) * VectorF.dot(col(vecCol), qLit), lit(0.0))))
      case "cosine" =>
        filtered.withColumn("distance",
          lit(1.0) - VectorF.dot(col(vecCol), qLit)
            / (sqrt(col("norm_sq")) * lit(math.sqrt(query.map(x => x * x).sum))))
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
    scored.orderBy(col("distance"), col(scored.columns.head)).limit(k)
  }
}
