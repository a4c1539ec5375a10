package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-quality statistics — `(nt, sw, n3, nd)` as one
  * struct from one traversal of the string:
  *
  *   nt = whitespace token count, sw = stopword occurrences,
  *   n3 = 3-shingle count (max(nt−2, 0)), nd = DISTINCT 3-shingles.
  *
  * Value-identical to the declarative HOF chain
  * (`TextF.tokens`/`shingles`/`hitCount` + `array_distinct`) that
  * `quality_filter` evaluated before — TextQualityStatsSpec pins the
  * equality corpus-wide and on the whitespace/unicode edge cases — but
  * ~an order of magnitude cheaper per row: the HOF chain materializes
  * the token and shingle arrays and walks them through interpreted
  * lambda evaluators once per derived column, where this is one
  * straight-line pass with a hash set, emitted into whole-stage codegen
  * as a single static call. Tokenization replicates the declarative
  * semantics exactly: UTF8String `trim`/`toLowerCase` (the same methods
  * Spark's `trim`/`lower` call), `\\s+` split, empties dropped — the
  * trim-vs-split boundary cases all land on empty tokens, which both
  * paths filter.
  */
case class TextQualityStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextQualityStats.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"textQualityStats needs a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextQualityStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextQualityStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : TextQualityStats = copy(child = newChild)

  override def prettyName: String = "text_quality_stats"
}

/** The kernel as ONE boolean — the quality KEEP verdict with the
  * thresholds baked in. The struct form's fields invite the optimizer
  * to push the filter through the projection and re-inline the kernel
  * once per conjunct field reference (up to 7 evaluations per row);
  * a single boolean expression cannot be split, so the kernel runs
  * exactly once per row no matter what the planner does. This is what
  * `quality_filter` evaluates; the struct form stays for analysis
  * projections that want the raw statistics. */
case class TextQualityKeep(child: Expression,
    minTokens: Int, maxTokens: Int,
    minStopwordPerMille: Int, maxRepetitionPerMille: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"textQualityKeep needs a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextQualityStats.keep(input.asInstanceOf[UTF8String],
      minTokens, maxTokens, minStopwordPerMille, maxRepetitionPerMille)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextQualityStats.keep($c, " +
        s"$minTokens, $maxTokens, $minStopwordPerMille, $maxRepetitionPerMille);")

  override protected def withNewChildInternal(newChild: Expression)
      : TextQualityKeep = copy(child = newChild)

  override def prettyName: String = "text_quality_keep"
}

object TextQualityStats {
  val schema: StructType = StructType(Seq(
    StructField("nt", IntegerType, nullable = false),
    StructField("sw", IntegerType, nullable = false),
    StructField("n3", IntegerType, nullable = false),
    StructField("nd", IntegerType, nullable = false)))

  // hoisted: String.split("\\s+") would recompile the pattern per row
  private val WS = java.util.regex.Pattern.compile("\\s+")

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextF.stopwords.foreach(s.add)
    s
  }

  /** One pass: tokenize (trim/lower via the SAME UTF8String methods the
    * declarative twin calls), count tokens + stopword hits, count
    * distinct 3-shingles through a hash set. Called from generated code
    * — keep the signature static-friendly. */
  def compute(text: UTF8String): InternalRow = {
    val s = statsOf(text)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s(0), s(1), s(2), s(3)))
  }

  /** The keep verdict with thresholds applied — called from generated
    * code; one kernel pass, integer arithmetic only. */
  def keep(text: UTF8String, minT: Int, maxT: Int,
      swPm: Int, repPm: Int): Boolean = {
    val s = statsOf(text)
    val nt = s(0); val sw = s(1); val n3 = s(2); val nd = s(3)
    nt >= minT && nt <= maxT &&
      sw.toLong * 1000 >= nt.toLong * swPm &&
      (n3.toLong - nd.toLong) * 1000 <= n3.toLong * repPm
  }

  private def statsOf(text: UTF8String): Array[Int] = {
    val raw = WS.split(text.trim().toLowerCase().toString)
    var nt = 0
    var sw = 0
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) {
        toks.add(t)
        nt += 1
        if (stopSet.contains(t)) sw += 1
      }
      i += 1
    }
    val n3 = math.max(nt - 2, 0)
    var nd = 0
    if (n3 > 0) {
      val seen = new java.util.HashSet[String](n3 * 2)
      var j = 0
      val sb = new java.lang.StringBuilder(48)
      while (j < nt - 2) {
        sb.setLength(0)
        sb.append(toks.get(j)).append(' ')
          .append(toks.get(j + 1)).append(' ').append(toks.get(j + 2))
        if (seen.add(sb.toString)) nd += 1
        j += 1
      }
    }
    Array(nt, sw, n3, nd)
  }

  /** Column form. */
  def stats(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TextQualityStats(org.apache.spark.sql.graft.ColumnBridge
        .eagerExpression(c)))

  /** Column form of the boolean keep verdict. */
  def keeps(c: org.apache.spark.sql.Column, minT: Int, maxT: Int,
      swPm: Int, repPm: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      TextQualityKeep(org.apache.spark.sql.graft.ColumnBridge
        .eagerExpression(c), minT, maxT, swPm, repPm))
}
