package graft.core

import graft.functions.SaltSelect
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join splitting can't help (e.g. the small side is too big to
  * broadcast but a handful of hot keys still dominate one shuffle
  * partition).
  *
  * The big (skewed) side gets a random-but-deterministic slice index in
  * [0, salt): each hot key's rows spread over `salt` shuffle partitions.
  * The small side is replicated `salt` times (explode over the per-key
  * salt list) so every (key, salt) bucket finds its match. The join
  * result is row-identical to the unsalted join — SkewJoinSpec proves
  * it — at the cost of `salt`x the small side's shuffle volume, which is
  * the standard trade: replicate the small input to split the hot keys.
  *
  * The slice index is a hash of the big side's row id expression (caller
  * supplies it), not `rand()` — deterministic retries and no
  * recomputation hazard under task re-execution.
  *
  * COLLISION-AWARE SALT VALUES (round 17): the join's exchange assigns
  * partition `pmod(murmur3(keys…, __salt), P)`, so naive salt ids
  * `0..salt-1` collide by the birthday problem — at salt 8 into P=16
  * shuffle partitions, two of a hot key's slices land together and the
  * worst task keeps ~2 slices of the hot mass (SCALE.md round 16:
  * 237k vs the ideal 86k). The salt VALUE each slice maps to is
  * therefore chosen per key by [[graft.functions.SaltSelect]]: a greedy
  * deterministic scan over candidate ints keeping the first `salt`
  * whose shuffle partitions (a pure function of `hash(keys…)` and the
  * candidate, because murmur3 folds field-at-a-time) are pairwise
  * distinct. Both sides compute the identical list independently —
  * zero coordination, zero extra shuffle — and a hot key's slices are
  * GUARANTEED to occupy `min(salt, P)` distinct partitions, making the
  * worst-task bound hot/salt + tail exactly, not hot·E[max collisions].
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with `big` salted by
    * `saltBy` (any deterministic per-row expression, e.g. the row id)
    * into `salt` buckets whose shuffle partitions are pairwise distinct
    * per key (see object doc). `numPartitions` defaults to the
    * session's effective initial shuffle-partition count — override
    * only when the join lands under a different exchange width. */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Column, salt: Int, numPartitions: Option[Int] = None): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val conf = big.sparkSession.conf
    // AQE's initialPartitionNum (when set) is the map-side bucket count
    // of every exchange, not spark.sql.shuffle.partitions
    val parts = numPartitions.getOrElse(
      conf.getOption("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        .flatMap(_.toIntOption)
        .getOrElse(conf.get("spark.sql.shuffle.partitions").toInt))
    def keyHash(df: DataFrame): Column = hash(keys.map(df(_)): _*)
    val bigS = big.withColumn("__salt",
      SaltSelect(keyHash(big), pmod(hash(saltBy), lit(salt)), salt, parts))
    val smallS = small.withColumn("__salt",
      explode(transform(sequence(lit(0), lit(salt - 1)),
        i => SaltSelect(keyHash(small), i, salt, parts))))
    bigS.join(smallS, keys :+ "__salt")
      .drop("__salt")
  }
}
