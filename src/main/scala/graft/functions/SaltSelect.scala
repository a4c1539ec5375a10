package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Collision-free salt VALUE selection for [[graft.core.SkewJoin]].
  *
  * A salted join on `(keys…, __salt)` shuffles by
  * `pmod(murmur3(keys…, __salt), P)` (Spark's
  * `HashPartitioning.partitionIdExpression`, seed 42 — the same hash the
  * SQL `hash()` function computes, folded left-to-right over the key
  * columns). With naive salt ids `0..salt-1` the hot key's slices land
  * in partitions by the birthday problem: at salt 8 into P=16 two hot
  * slices share a partition and the worst task keeps ~2/8 of the hot
  * mass (SCALE.md round 16 measured exactly that, 237k vs the ideal
  * 86k). Because murmur3 folds one field at a time, the partition of
  * `(k, s)` is `floorMod(hashInt(s, hash(k)), P)` — a pure function of
  * the PER-KEY hash prefix and the candidate salt — so each key can
  * GREEDILY pick `salt` integer salt values whose partitions are
  * pairwise distinct. Both join sides run the identical deterministic
  * scan, so they agree on every key's salt list with no driver
  * coordination and no extra shuffle.
  *
  * `left` = the murmur3 hash of the join-key columns (the `hash(keys…)`
  * the shuffle itself computes as its fold prefix); `right` = the slice
  * index in `[0, salt)`. Returns the slice-th selected candidate:
  * scanning c = 0,1,2,…, a candidate is selected iff its partition
  * `floorMod(hashInt(c, hk), P)` is unseen among this key's earlier
  * selections; once all P partitions are covered the seen-set clears
  * (so salt > P degrades to balanced round-robin coverage instead of
  * livelock). Selected candidates are strictly increasing, hence
  * pairwise distinct — a big-side row matches exactly ONE replicated
  * small-side row, preserving row identity. The scan is a tight
  * int-only loop (expected `slice + O(collisions)` iterations,
  * coupon-collector bounded) inlined into whole-stage codegen.
  *
  * Guarantee boundary: distinct-partition placement assumes the join's
  * exchange hashes exactly `(keys…, __salt)` with P partitions — true
  * for an equi sort-merge/shuffled-hash join when both sides' key
  * dtypes already agree (no analyzer cast on the keys) and P is the
  * session's shuffle partition count. Row identity of the join NEVER
  * depends on any of that; a mismatch only costs the collision-freeness
  * and falls back to birthday spreading, no worse than the naive salt.
  */
case class SaltSelect(left: Expression, right: Expression,
    salt: Int, numPartitions: Int) extends BinaryExpression {
  require(salt >= 1, s"salt must be >= 1, got $salt")
  require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")

  override def prettyName: String = "graft_salt_select"
  override def dataType: DataType = IntegerType

  // generous termination bound: filling P partition slots takes
  // P·H(P) ≈ P ln P expected draws; 64·(P + salt) is astronomically
  // beyond any real tail, and the fallback stays slice-distinct
  private def scanLimit: Int = 64 * (numPartitions + salt)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int keyHash, int slice), got " +
          s"${l.simpleString(100)} and ${r.simpleString(100)}")
    }

  override protected def nullSafeEval(keyHash: Any, slice: Any): Any = {
    val hk = keyHash.asInstanceOf[Int]
    val sl = slice.asInstanceOf[Int]
    val seen = new Array[Long]((numPartitions + 63) / 64)
    var found = 0
    var c = 0
    val limit = scanLimit
    while (c < limit) {
      val p = java.lang.Math.floorMod(
        Murmur3_x86_32.hashInt(c, hk), numPartitions)
      if ((seen(p >>> 6) & (1L << p)) == 0L) {
        seen(p >>> 6) |= (1L << p)
        found += 1
        if (found == sl + 1) return c
        if (found % numPartitions == 0) java.util.Arrays.fill(seen, 0L)
      }
      c += 1
    }
    limit + sl // unreachable in practice; still distinct per slice
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hk, sl) => {
      val words = (numPartitions + 63) / 64
      val seen = ctx.addMutableState("long[]", "saltSeen",
        v => s"$v = new long[$words];")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val found = ctx.freshName("found")
      s"""
         |java.util.Arrays.fill($seen, 0L);
         |int $found = 0;
         |${ev.value} = $scanLimit + $sl;
         |for (int $c = 0; $c < $scanLimit; $c++) {
         |  int $p = java.lang.Math.floorMod(
         |    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt($c, $hk),
         |    $numPartitions);
         |  if (($seen[$p >>> 6] & (1L << $p)) == 0L) {
         |    $seen[$p >>> 6] |= (1L << $p);
         |    $found++;
         |    if ($found == $sl + 1) { ${ev.value} = $c; break; }
         |    if ($found % $numPartitions == 0) java.util.Arrays.fill($seen, 0L);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SaltSelect =
    copy(left = l, right = r)
}

object SaltSelect {
  def apply(keyHash: Column, slice: Column, salt: Int, numPartitions: Int): Column =
    ColumnBridge.column(SaltSelect(ColumnBridge.expression(keyHash),
      ColumnBridge.expression(slice), salt, numPartitions))
}
