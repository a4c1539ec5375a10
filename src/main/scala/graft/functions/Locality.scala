package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the lakehouse multi-dimensional
  * locality key (Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting by the
  * bit-interleave of two bounded dimensions clusters rows that are near
  * in EITHER dimension into the same file ranges, so min/max data
  * skipping prunes scans on both columns from one physical order. The
  * arithmetic is plain shifts+adds, identical in the DuckDB oracle. */
object Locality {

  /** Interleave the low 16 bits of `a` (even positions) and `b` (odd
    * positions) into a 32-bit z-value. Inputs are masked to 16 bits, so
    * callers bucket/hash wider domains first.
    *
    * Implemented as the classic bit-spread shift/mask ladder (4 masked
    * doublings per dimension) — every step is a plain long bitwise op
    * inside whole-stage codegen, where the earlier per-bit
    * aggregate(sequence(0,15)) fold dispatched an interpreted lambda 16
    * times per row (the dominant cost of q_zorder_key's full-table
    * scan). Bit-identical to the per-bit fold: the spread bits are
    * disjoint, so OR == the sum the fold computed. */
  def zorder16(a: Column, b: Column): Column = {
    val am = pmod(a.cast("long"), lit(65536L))
    val bm = pmod(b.cast("long"), lit(65536L))
    def spread(x: Column): Column = {
      val s0 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s1 = s0.bitwiseOR(shiftleft(s0, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 2)).bitwiseAND(lit(0x33333333L))
      s2.bitwiseOR(shiftleft(s2, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(am).bitwiseOR(shiftleft(spread(bm), 1))
  }
}
