package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join splitting can't help (e.g. the small side is too big to
  * broadcast but a handful of hot keys still dominate one shuffle
  * partition).
  *
  * The big (skewed) side gets a random-but-deterministic salt in
  * [0, salt): each hot key's rows spread over `salt` shuffle partitions.
  * The small side is replicated `salt` times (explode over the salt
  * range) so every (key, salt) bucket finds its match. The join result
  * is row-identical to the unsalted join — SkewJoinSpec proves it — at
  * the cost of `salt`x the small side's shuffle volume, which is the
  * standard trade: replicate the small input to split the hot keys.
  *
  * The salt is a hash of the big side's row id expression (caller
  * supplies it), not `rand()` — deterministic retries and no
  * recomputation hazard under task re-execution.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, with `big` salted by
    * `saltBy` (any deterministic per-row expression, e.g. the row id)
    * into `salt` buckets. */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Column, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val bigS = big.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "__salt")
      .drop("__salt")
  }
}
