package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sign-based (hyperplane) LSH candidate generation for cosine near-dup
  * joins in the PRODUCTION threshold regime (τ ≳ 0.9).
  *
  * Each of `bands` hash tables keys a vector by `bits` packed sign bits,
  * sign(plane·(v − μ)) over seeded deterministic Gaussian hyperplanes
  * (μ = a spread-sample mean, so biased corpora don't collapse the key
  * space — the same centering idea as [[BqIndex]]'s mean thresholds).
  * Candidates meet in a plain (band, key) equi-join: AND over the `bits`
  * signs makes each table selective (background pairs collide at
  * ~2^-bits), OR over `bands` tables restores recall for
  * high-cosine pairs (per-plane flip probability θ/π — Goemans/Williamson
  * hyperplane rounding). This is the amplification
  * [[LshJoin]]'s MLlib scheme cannot express: `BucketedRandomProjectionLSH`
  * ORs single-projection buckets, so on near-uniform high-dimensional
  * data every table keeps ~all pairs; selective pruning needs the AND
  * stage.
  *
  * Role (SCALE.md): the dense-threshold entry `q_dedup_embedding`
  * (τ = 0.45, zero distance margin in the testdata) is inherently
  * all-pairs for EXACT results — candidate pruning at that τ is
  * information-theoretically off the table for near-uniform vectors. At a
  * production near-dup threshold the angular gap is wide
  * (θ_true ≤ 26° vs background ≈ 90°) and this generator prunes the
  * candidate join to near-bucket-local work. Recall of the fixed-seed
  * generator is exact on the planted-pair workloads and pinned in
  * SignLshSpec; callers own the exact verify of every candidate, so
  * precision is always exact.
  *
  * Scale: planes are `bands·bits·dim` doubles broadcast (KB-scale); the
  * hashed table is (id, band, key) longs — one narrow encode pass, one
  * bucketed shuffle. Bucket occupancy grows linearly with corpus size at
  * fixed `bits`, so `bits` is the log₂(n)-ish knob: raise it (and
  * `bands` with it) as the corpus grows to hold per-bucket work constant.
  *
  * Reference semantics: the GANN candidate-generation role
  * (radient/tasks/sinks/local/gann.py:234-239) specialised to the
  * dedup self-join, with the banding shape of q_dedup_simhash.
  */
object SignLsh {

  /** Deterministic Gaussian hyperplanes: bands·bits rows of dim doubles.
    * java.util.Random's Gaussian stream is algorithmically specified, so
    * the planes (and every downstream key) are stable across JVMs. */
  private[index] def planes(dim: Int, bands: Int, bits: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bands * bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private[index] def encodeOne(v: IndexedSeq[Double], mean: Array[Double],
      pl: Array[Array[Double]], bands: Int, bits: Int): Array[Long] = {
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val w = pl(b * bits + j)
        var s = 0.0
        var i = 0
        while (i < w.length) { s += (v(i) - mean(i)) * w(i); i += 1 }
        if (s > 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    keys
  }

  private val hashedMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The hashed table (id, band, key), cached; memoized per
    * (application, memoKey) under the [[LshJoin]] contract: the memo key
    * must uniquely name the input frame, and the LSH params are folded in
    * here so a params change can never be served a stale table. */
  def bandKeys(df: DataFrame, idCol: String, vecCol: String,
      bands: Int, bits: Int, seed: Long,
      memoKey: Option[String] = None): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
    def build(): DataFrame = {
      val vecD = col(vecCol).cast("array<double>")
      val sample = IvfIndex.hashSample(df, idCol, vecD, 4096)
      if (sample.isEmpty)
        // empty-frame propagation (the [None] skip protocol): no rows to
        // hash → an empty (id, band, key) table with the right schema
        return df.select(col(idCol), lit(0).as("band"), lit(0L).as("key"))
          .limit(0)
      val dim = sample(0).length
      val mean = new Array[Double](dim)
      sample.foreach { v =>
        var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
      }
      locally { var i = 0; while (i < dim) { mean(i) /= sample.length; i += 1 } }
      val pl = planes(dim, bands, bits, seed)
      val bc = df.sparkSession.sparkContext.broadcast((mean, pl))
      val encUdf = udf { (v: Seq[Double]) =>
        val (m, p) = bc.value
        encodeOne(v.toIndexedSeq, m, p, bands, bits).toSeq
      }
      graft.core.Caches.cached(
        df.select(col(idCol), posexplode(encUdf(vecD)).as(Seq("band", "key"))))
    }
    memoKey match {
      case Some(k0) =>
        val k = s"signlsh#$k0#b=$bands#k=$bits#seed=$seed"
        graft.core.Caches.memoized(df.sparkSession, k, hashedMemo)(build())
      case None => build()
    }
  }

  /** Unverified candidate pairs (idA < idB), distinct — one bucketed
    * equi-join over the hashed table. The caller MUST exact-verify every
    * pair (the [[graft.queries.Dedup]] entries re-join the original
    * vectors and filter on the exact fold), so false positives cost only
    * the verify pass and never reach the output. */
  def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
      bands: Int = 48, bits: Int = 12, seed: Long = 7L,
      memoKey: Option[String] = None): DataFrame = {
    val h = bandKeys(df, idCol, vecCol, bands, bits, seed, memoKey)
    h.select(col(idCol).as(s"${idCol}_a"), col("band"), col("key"))
      .join(h.select(col(idCol).as(s"${idCol}_b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"))
      .distinct()
  }
}
