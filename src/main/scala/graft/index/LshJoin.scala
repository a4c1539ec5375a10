package graft.index

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-native approximate similarity joins — the scaled ANN-join path
  * promised in SURVEY.md §7.1 item 9: `BucketedRandomProjectionLSH` for
  * L2 neighbours and `MinHashLSH` for Jaccard neighbours, both via
  * `approxSimilarityJoin` (bucket equi-join on hashed keys — candidates
  * meet only inside buckets, never an O(n²) cross join).
  *
  * These complement the hand-built indexes: IvfIndex/GannIndex give
  * controllable probe behaviour; the MLlib path gives the stock,
  * battle-tested join operator for one-shot dedup/link jobs at scale.
  * Reference semantics: the GANN candidate-generation role
  * (radient/tasks/sinks/local/gann.py) for L2, and the MinHash banding
  * role for Jaccard.
  */
object LshJoin {

  /** Approximate L2 neighbour pairs within `threshold` between `a.idA`
    * and `b.idB` embedding tables. Output: (idA, idB, dist). */
  def l2Join(a: DataFrame, b: DataFrame, idA: String, idB: String,
      vecCol: String, threshold: Double,
      bucketLength: Double = 2.0, numTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val fa = a.select(col(idA), array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val fb = b.select(col(idB), array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(fa)
    model.approxSimilarityJoin(fa, fb, threshold, "dist")
      .select(col(s"datasetA.$idA").as(idA), col(s"datasetB.$idB").as(idB),
        col("dist"))
  }

  /** Self-join variant for dedup: the input is featurized and HASHED
    * exactly once (cached), and the candidate join + distance verify run
    * as NATIVE plan operators over the model's buckets — bucket keys are
    * exploded to (table, bucket) rows, candidates meet in a plain
    * equi-join, duplicates collapse in an id-only distinct, and the
    * distance filter is the codegen [[graft.functions.L2Distance]] kernel.
    * `approxSimilarityJoin` computes the same candidate set from the same
    * model but pays a non-codegen `keyDistance` UDF per candidate ROW
    * (pre-distinct, so once per shared table) — with wide buckets that UDF
    * pass dominates. Both distance definitions are the same sequential
    * (xᵢ−yᵢ)² double fold, so the surviving pair set is identical
    * (LshJoinSpec pins equality against the two-sided MLlib join).
    *
    * `memoKey`: the hashed-bucket table is fit-once index state (the LSH
    * twin of the memoized GANN/IVF models and tf-idf Postings), but its
    * plan embeds per-fit UDF closures, so Spark's plan-identity cache
    * dedup never fires across calls — callers that re-run the same
    * (dataset, params) join pass a stable key to reuse the hashed table
    * instead of refitting + re-caching per invocation. Evicted by
    * `Caches.clear` like every memoized model.
    * Output: (idA, idB, dist) with idA < idB. */
  private val hashedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def l2SelfJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketLength: Double = 2.0, numTables: Int = 3,
      seed: Long = 42L, memoKey: Option[String] = None): DataFrame = {
    def buildHashed(): DataFrame = {
      val f = df.select(col(idCol),
        array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      val model = lsh.fit(f)
      graft.core.Caches.cached(
        model.transform(f)
          .select(col(idCol), vector_to_array(col("features")).as("v"),
            posexplode(col("hashes")).as(Seq("htab", "hv")))
          .select(col(idCol), col("v"), col("htab"),
            element_at(vector_to_array(col("hv")), 1).as("hkey")))
    }
    // the LSH fit params are folded into the memo key so a later call
    // with the same caller key but different bucketLength/numTables/seed
    // can never be served a stale hashed table (whose candidate pairs
    // would silently come from the old fit). The DATASET is still the
    // caller's contract: memoKey must uniquely name the input frame
    // (the query entries key by table dir), since frame identity is not
    // observable here.
    val hashed = memoKey match {
      case Some(k0) =>
        val k = s"$k0#bl=$bucketLength#nt=$numTables#seed=$seed"
        graft.core.Caches.memoized(df.sparkSession, k, hashedMemo)(buildHashed())
      case None => buildHashed()
    }
    val cand = hashed.select(col(idCol).as(s"${idCol}_a"), col("htab"), col("hkey"))
      .join(hashed.select(col(idCol).as(s"${idCol}_b"), col("htab"), col("hkey")),
        Seq("htab", "hkey"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"))
      .distinct()
    // verify sides come from the INPUT (one row per id already) — deriving
    // them from the exploded hashed table needed a wide distinct over
    // (id, vector) per side, two full-vector shuffles for nothing
    val vecs = df.select(col(idCol),
      col(vecCol).cast("array<double>").as("v"))
    val va = vecs.select(col(idCol).as(s"${idCol}_a"), col("v").as("va"))
    val vb = vecs.select(col(idCol).as(s"${idCol}_b"), col("v").as("vb"))
    cand.join(va, Seq(s"${idCol}_a")).join(vb, Seq(s"${idCol}_b"))
      .withColumn("dist",
        graft.functions.VectorF.l2Dist(col("va"), col("vb")))
      .filter(col("dist") < threshold)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("dist"))
  }

  /** Approximate Jaccard-similar pairs (distance = 1 − J) between two
    * tables of term/shingle arrays, hashed through a shared vocabulary
    * index. Output: (idA, idB, jaccard_dist). */
  def jaccardJoin(a: DataFrame, b: DataFrame, idA: String, idB: String,
      setCol: String, maxDistance: Double, vocabSize: Int = 1 << 18,
      numTables: Int = 5, seed: Long = 42L): DataFrame = {
    // hash terms into a fixed sparse space (binary presence vector)
    def featurize(df: DataFrame, id: String): DataFrame = {
      val toIdx = udf { (terms: Seq[String]) =>
        val idx = terms.map(t => math.floorMod(t.hashCode, vocabSize)).distinct.sorted
        MlVectors.sparse(vocabSize, idx.toArray, Array.fill(idx.length)(1.0))
      }
      df.select(col(id), toIdx(col(setCol)).as("features"))
        // MinHashLSH requires ≥1 non-zero entry
        .filter(udf { (v: org.apache.spark.ml.linalg.Vector) => v.numNonzeros > 0 }
          .apply(col("features")))
    }
    val fa = featurize(a, idA)
    val fb = featurize(b, idB)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(fa)
    model.approxSimilarityJoin(fa, fb, maxDistance, "jaccard_dist")
      .select(col(s"datasetA.$idA").as(idA), col(s"datasetB.$idB").as(idB),
        col("jaccard_dist"))
  }
}
