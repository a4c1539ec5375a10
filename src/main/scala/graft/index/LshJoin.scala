package graft.index

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
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
    * exactly once (cached), then joined with itself — the two-sided form
    * re-derives projections and hash buckets per side, which doubles the
    * UDF-heavy part of the plan for the common pair-mining case. Output:
    * (idA, idB, dist) with idA < idB. */
  def l2SelfJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketLength: Double = 2.0, numTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val f = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(f)
    val hashed = model.transform(f).cache()
    model.approxSimilarityJoin(hashed, hashed, threshold, "dist")
      .filter(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(col(s"datasetA.$idCol").as(s"${idCol}_a"),
        col(s"datasetB.$idCol").as(s"${idCol}_b"), col("dist"))
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
