package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd k-component MinHash signature over a shingle array —
  * the signature kernel of MinHash+LSH dedup as one tight loop (k salted
  * md5s per shingle, running minima in a primitive array).
  *
  * BIT-IDENTICAL to the per-component HOF formulation it replaces and to
  * the DuckDB oracle (`graft.queries.Sql.minhash`): component j is
  * min over shingles of h32("j#" ++ s) where h32 = first 8 hex chars of
  * md5 parsed base-16 (= first 4 digest bytes as an unsigned 32-bit
  * value); an empty array (or all-null elements) yields -1 per component
  * and null ELEMENTS are skipped — exactly `coalesce(array_min(
  * transform(sh, s => h32(concat("j#", s)))), -1)` semantics (array_min
  * ignores nulls). All arithmetic is integer. Null input → null.
  * Reference: the MinHash banding role of the dedup family
  * (SURVEY.md §2's beyond-reference pipeline ops); kernel style follows
  * gann.c:460-492.
  */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashK.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mh")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinHashK.compute($c, $k);
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashK =
    copy(child = c)
}

object MinHashK {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and codegen. Null elements are SKIPPED
    * (array_min parity); components with no contributing shingle are -1. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val digest = md5.get()
    val salts = Array.tabulate(k)(j => s"$j#".getBytes("UTF-8"))
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          digest.reset()
          digest.update(salts(j))
          val md = digest.digest(s)
          // first 8 hex chars == first 4 digest bytes, unsigned
          var h = 0L
          var b = 0
          while (b < 4) { h = (h << 8) | (md(b) & 0xffL); b += 1 }
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    var j = 0
    while (j < k) { if (mins(j) == Long.MaxValue) mins(j) = -1L; j += 1 }
    new GenericArrayData(mins)
  }
}
