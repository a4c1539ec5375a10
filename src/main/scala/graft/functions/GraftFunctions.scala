package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge.{column, eagerExpression, registerFunction}

/** SQL registration of the engine's scalar kernels: every graft scalar
  * function becomes callable from `spark.sql(...)` — `graft_dot`,
  * `graft_l2_dist`, `graft_cosine`, `graft_h32`, `graft_h60`,
  * `graft_simhash60`, `graft_tokens`, `graft_fingerprint`,
  * `graft_hamming` — exactly as a user of the reference calls its
  * vectorizer kernels from Python (radient/README.md:15-18's
  * `vectorizer.vectorize`, gann.c:460-492's distance kernels).
  *
  * Two registration paths, same builders:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    construction (the [[SparkSessionExtensions.injectFunction]] route —
  *    zero code dependency, config-only), or
  *  - [[GraftFunctions.register]] on an existing session (runtime route).
  *
  * Builders compose the SAME Column implementations the DataFrame API
  * uses ([[VectorF]]/[[TextF]]), so SQL callers get bit-identical
  * semantics — codegen kernels for dot/L2, HOF folds for the text
  * hashes — not a parallel re-implementation.
  */
object GraftFunctions {

  private def fd(name: String, arity: Int, usage: String)(
      build: Seq[Column] => Column):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      eagerExpression(build(children.map(column)))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GraftFunctions", null, name, usage, ""),
      builder)
  }

  /** The full registry (name, info, builder) — shared by both paths. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fd("graft_dot", 2, "sequential-fold dot product of two float/double arrays") {
      cs => VectorF.dot(cs(0), cs(1)) },
    fd("graft_l2_dist", 2, "sequential-fold euclidean distance") {
      cs => VectorF.l2Dist(cs(0), cs(1)) },
    fd("graft_l2_norm", 1, "euclidean norm") { cs => VectorF.l2Norm(cs(0)) },
    fd("graft_cosine", 2, "cosine similarity") { cs => VectorF.cosine(cs(0), cs(1)) },
    fd("graft_normalize", 1, "unit L2 normalization; zero vector maps to zeros") {
      cs => VectorF.normalize(cs(0)) },
    fd("graft_hamming", 2, "popcount hamming distance of two long signatures") {
      cs => VectorF.hammingDist(cs(0), cs(1)) },
    fd("graft_hamming_words", 2, "summed popcount hamming over packed array<bigint> signatures") {
      cs => VectorF.hammingWords(cs(0), cs(1)) },
    fd("graft_h32", 1, "deterministic 32-bit md5-prefix hash") { cs => TextF.h32(cs(0)) },
    fd("graft_h60", 1, "deterministic 60-bit md5-prefix hash") { cs => TextF.h60(cs(0)) },
    fd("graft_tokens", 1, "lowercased whitespace tokens, empties dropped") {
      cs => TextF.tokens(cs(0)) },
    fd("graft_simhash60", 1, "60-bit TF-weighted SimHash of a token array") {
      cs => TextF.simhash60(cs(0)) },
    fd("graft_fingerprint", 1, "min-hash document fingerprint over 3-shingles") {
      cs => TextF.fingerprint(cs(0)) })

  /** Runtime registration into an existing session. Idempotent (the
    * registry overwrites by name). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) => registerFunction(spark, id, info, b) }
}

/** Config-only registration: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` when building
  * the session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
