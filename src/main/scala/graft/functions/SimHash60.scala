package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd 60-bit TF-weighted SimHash over a token array — the
  * hot signature kernel of SimHash dedup as one tight loop (md5 per
  * token, 60-bit tally in a primitive array), replacing a 60-slot
  * higher-order-function fold that paid per-element lambda dispatch for
  * every (token, bit) pair.
  *
  * BIT-IDENTICAL to the HOF formulation it replaces and to the DuckDB
  * oracle (`graft.queries.Sql.simhash60`): per token
  * h = first 15 hex chars of md5(utf8 bytes) parsed base-16
  *   = top 60 bits of the first 8 digest bytes (big-endian),
  * bit j of the signature is set iff 2·(count of tokens with bit j set)
  * > n_tokens. All arithmetic is integer, so there is no fold-order or
  * precision concern. Null input → null; a null ELEMENT poisons the
  * result (matching the HOF null semantics). Reference:
  * the SimHash fingerprinting role of radient's text path (e.g.
  * radient/tasks/vectorizers/text/sklearn.py's term-frequency features);
  * kernel style follows gann.c:460-492.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sh")
      s"""
         |java.lang.Long $r = graft.functions.SimHash60.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

object SimHash60 {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and codegen. Null iff any element is
    * null (HOF null-poison parity). */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](60)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      digest.reset()
      val md = digest.digest(arr.getUTF8String(i).getBytes)
      // top 60 bits of the first 8 digest bytes == base-16 parse of the
      // first 15 hex chars (TextF.h60 / Sql.h60)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (md(k) & 0xffL); k += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 60) { if (2L * cnt(j) > n) sh |= 1L << j; j += 1 }
    java.lang.Long.valueOf(sh)
  }
}
