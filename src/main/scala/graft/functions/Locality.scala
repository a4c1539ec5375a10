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
    * callers bucket/hash wider domains first. */
  def zorder16(a: Column, b: Column): Column = {
    val am = pmod(a.cast("long"), lit(65536L))
    val bm = pmod(b.cast("long"), lit(65536L))
    aggregate(sequence(lit(0), lit(15)), lit(0L),
      (acc, j) => acc +
        call_function("shiftleft",
          call_function("shiftright", am, j).bitwiseAND(lit(1L)), j * 2) +
        call_function("shiftleft",
          call_function("shiftright", bm, j).bitwiseAND(lit(1L)), j * 2 + lit(1)))
  }
}
