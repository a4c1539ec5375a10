package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-similarity self-join: all (a, b) pairs with Jaccard ≥ τ over a
  * table of (id, block, set, n) rows — the candidate-generation engine
  * behind n-gram dedup. Two result-identical strategies:
  *
  *  - [[countJoin]]: explode ALL elements, equi-join postings, count
  *    common elements per pair (J from |∩| alone). Best when posting
  *    lists are short/uniform — one aggregate, no per-doc ranking.
  *  - [[prefixFiltered]] (PPJoin-family): order each set rarest-first by
  *    global document frequency and emit only the first
  *    |s| − ⌈τ·|s|⌉ + 1 elements as postings; J ≥ τ forces a shared
  *    element inside both prefixes (with the size band τ ≤ |A|/|B| ≤ 1/τ,
  *    |A∩B| ≥ τ·max(|A|,|B|), and the standard prefix lemma), then the
  *    few candidates verify with an exact intersection. Best at scale on
  *    skewed corpora: hot elements fall OUTSIDE prefixes, so the
  *    quadratic blowup of frequent-shingle posting lists disappears.
  *
  * Both shuffle on (block, element); neither ever materializes a
  * same-block cross product. SetSimJoinSpec pins strategy equivalence.
  *
  * A third relation, [[containmentJoin]], handles the ASYMMETRIC
  * |A∩B| ≥ τ·|A| containment test with a one-sided prefix filter.
  */
object SetSimJoin {

  /** Input contract: df(idCol, blockCol, setCol array<string>, nCol). */
  def countJoin(df: DataFrame, idCol: String, blockCol: String,
      setCol: String, nCol: String, tau: Double): DataFrame = {
    val posting = df.select(col(idCol), col(blockCol), col(nCol),
      explode(col(setCol)).as("s"))
    val a = posting.select(col(idCol).as("id_a"), col(blockCol),
      col("s"), col(nCol).as("na"))
    val b = posting.select(col(idCol).as("id_b"), col(blockCol),
      col("s"), col(nCol).as("nb"))
    a.join(b, Seq(blockCol, "s"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("na").cast("double") * tau <= col("nb") &&
        col("nb").cast("double") * tau <= col("na"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Containment strategy selector — see [[containmentJoin]]. */
  sealed trait Strategy
  object Strategy {
    /** Decide per corpus from the exact raw-join row count (one
      * aggregate over the posting table). */
    case object Auto extends Strategy
    /** Raw posting self-join + count — cheapest when no shingle is hot. */
    case object Raw extends Strategy
    /** One-sided df-ranked prefix filter + exact verify — candidate
      * volume stays linear under hot shingles. */
    case object Prefix extends Strategy
  }

  /** [[Strategy.Auto]] bound: the raw posting self-join is selected only
    * when its EXACT join-row count Σ_(block,s) df·(df−1) is at most this
    * many rows per posting (Σ df) — i.e. raw shuffle volume provably
    * ≤ 16× the posting table, linear in corpus size with a small
    * constant. Measured anchors: the real `documents` corpus sits at
    * 0.3 (sf0.01) and 2.5 (sf0.1) rows/posting (raw is ~2× cheaper than
    * the prefix pass there — the round-11 "insurance premium"), while a
    * planted hot shingle shared by m docs drives the ratio to ~m/|set|
    * (≈55 at m=500), far past the bound; growth in the ratio is exactly
    * the regime where the prefix filter's linearity guarantee earns its
    * fixed cost. */
  val RawRowsPerPosting = 16L

  /** Asymmetric CONTAINMENT join: all ordered (a, b) pairs with
    * |A∩B| ≥ (tauNum/tauDen)·|A| — "a is contained in b". The threshold
    * is one-sided, so the PPJoin size band does not apply (b may be
    * arbitrarily larger than a). Two result-identical physical
    * strategies, chosen per corpus by [[Strategy.Auto]] (round 12):
    *
    *  - [[Strategy.Raw]]: posting self-join on (block, element) +
    *    per-pair count; n_shared comes straight from the count (inputs
    *    are distinct sets), so no array payload ever ships. Join rows =
    *    Σ df·(df−1) — safe and ~2× cheaper than the prefix pass exactly
    *    when that sum is small.
    *  - [[Strategy.Prefix]]: the one-sided prefix lemma — if a misses at
    *    most |A| − ⌈τ·|A|⌉ of its elements in B, then among a's first
    *    |A| − ⌈τ·|A|⌉ + 1 elements IN ANY FIXED ORDER at least one is
    *    shared with B. Ordering a's elements rarest-first by global
    *    document frequency makes that prefix the cheapest possible
    *    postings: hot shingles (the boilerplate/quote corpora
    *    containment targets) fall OUTSIDE every a-prefix, so a shingle
    *    shared by m docs contributes m a-side·m b-side = m² pairs in a
    *    raw posting join but only (few rare a-prefix entries)·m here.
    *    B-side emits ALL postings (the lemma binds only a's side);
    *    survivors verify with an exact distinct-set intersection.
    *
    * Auto pays one posting aggregate (the inverted-index dictionary
    * Σ df, Σ df·(df−1) — a 1-row bounded collect) to read the decision
    * variable, then runs the strategy whose cost model wins; the
    * planted-hot-shingle guarantee is kept because a hot corpus can
    * never pass the [[RawRowsPerPosting]] bound. Both strategies apply
    * the integer cross-multiplication n_shared·tauDen ≥ |A|·tauNum — no
    * float boundary; τ is a rational so the prefix length ⌈τ·|A|⌉ folds
    * in exact integer arithmetic.
    *
    * Output: (id_a, id_b, n_shared, na) — ordered pairs; mutual
    * containment emits both directions. Input sets must be distinct
    * (both the count and array_intersect count distinct matches).
    * Reference relation: RefinedWeb-style quote-inclusion checks; the
    * symmetric sibling is [[countJoin]]/[[prefixFiltered]].
    * SetSimJoinSpec pins Raw ≡ Prefix ≡ Auto on mutual-containment and
    * hot-shingle fixtures; PlanShapeSpec pins both sanctioned plans. */
  def containmentJoin(df: DataFrame, idCol: String, blockCol: String,
      setCol: String, nCol: String, tauNum: Int, tauDen: Int,
      strategy: Strategy = Strategy.Auto): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"containment threshold must be a rational in (0, 1]: $tauNum/$tauDen")
    val chosen = strategy match {
      case Strategy.Auto =>
        choosePostingStrategy(df, idCol, blockCol, setCol)
      case s => s
    }
    chosen match {
      case Strategy.Raw =>
        val posting = df.select(col(idCol), col(blockCol), col(nCol),
          explode(col(setCol)).as("s"))
        val a = posting.select(col(idCol).as("id_a"), col(blockCol),
          col("s"), col(nCol).as("na"))
        val b = posting.select(col(idCol).as("id_b"), col(blockCol), col("s"))
        a.join(b, Seq(blockCol, "s"))
          .filter(col("id_a") =!= col("id_b"))
          .groupBy(col("id_a"), col("id_b"), col("na"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") * tauDen >= col("na").cast("long") * tauNum)
          .select(col("id_a"), col("id_b"), col("n_shared"),
            col("na").cast("long").as("na"))
      case _ =>
        val pairs = containmentCandidates(
          df, idCol, blockCol, setCol, nCol, tauNum, tauDen)
        val sa = df.select(col(idCol).as("id_a"), col(setCol).as("set_a"),
          col(nCol).as("na"))
        val sb = df.select(col(idCol).as("id_b"), col(setCol).as("set_b"))
        pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
          .withColumn("n_shared",
            size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
          .filter(col("n_shared") * tauDen >= col("na").cast("long") * tauNum)
          .select(col("id_a"), col("id_b"), col("n_shared"),
            col("na").cast("long").as("na"))
    }
  }

  private val strategyMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Strategy]()

  /** [[Strategy.Auto]]'s decision (shared by the containment and the
    * symmetric Jaccard joins — the decision variable is identical): one
    * aggregate over the per-(block, element) posting-list lengths
    * yields the EXACT raw-join row count Σ df·(df−1) and the posting
    * count Σ df; raw wins iff rawRows ≤ [[RawRowsPerPosting]]·postings.
    * The aggregate is a full posting pass — the same pass the prefix
    * branch's global-df ranking pays anyway, and a cheap insurance
    * premium on raw-favorable corpora (the entry's shingle table is
    * session-cached upstream).
    *
    * Memoized per (application, canonicalized input plan): repeated
    * joins over the same corpus (a session's dedup passes, the bench's
    * timed passes) pay the decision once. Safe to memoize on a plan
    * HASH because the strategy never affects the result — a collision
    * could only cost performance, not correctness — and [[Caches.clear]]
    * evicts the entry with the session's other memos. */
  private[graft] def choosePostingStrategy(df: DataFrame, idCol: String,
      blockCol: String, setCol: String): Strategy =
    graft.core.Caches.memoized(df.sparkSession,
      s"posting-strategy#${df.queryExecution.analyzed.semanticHash()}" +
        s"#$idCol#$blockCol#$setCol",
      strategyMemo) { computePostingStrategy(df, idCol, blockCol, setCol) }

  private def computePostingStrategy(df: DataFrame, idCol: String,
      blockCol: String, setCol: String): Strategy = {
    val stats = df
      .select(col(idCol), col(blockCol), explode(col(setCol)).as("s"))
      .groupBy(col(blockCol), col("s")).agg(count(lit(1)).as("df"))
      .agg(coalesce(sum(col("df")), lit(0L)).as("p"),
        coalesce(sum(col("df") * (col("df") - 1L)), lit(0L)).as("raw"))
      .head()
    if (stats.getLong(1) <= RawRowsPerPosting * stats.getLong(0))
      Strategy.Raw
    else Strategy.Prefix
  }

  /** [[containmentJoin]]'s candidate-generation stage, exposed so the
    * scale harness (graft.Scale) can count candidate pairs directly —
    * the number that stays ~linear under a planted hot shingle where a
    * raw posting self-join goes quadratic. */
  private[graft] def containmentCandidates(df: DataFrame, idCol: String,
      blockCol: String, setCol: String, nCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"containment threshold must be a rational in (0, 1]: $tauNum/$tauDen")
    val posting = df.select(col(idCol), col(blockCol), col(nCol),
      explode(col(setCol)).as("s"))
    val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
    // ⌈τ·n⌉ = ⌊(n·num + den − 1) / den⌋ — exact for n ≪ 2^53/den
    val ceilTauN = floor((col(nCol) * tauNum + (tauDen - 1)) / tauDen)
    val aPrefix = posting.join(freq, Seq("s"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("s"))))
      .filter(col("pos") <= col(nCol) - ceilTauN + 1)
      .select(col(idCol).as("id_a"), col(blockCol), col("s"))
    val b = posting.select(col(idCol).as("id_b"), col(blockCol), col("s"))
    aPrefix.join(b, Seq(blockCol, "s"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Symmetric Jaccard join with COST-BASED strategy selection
    * (round 12 — the second consumer of [[choosePostingStrategy]]):
    * [[countJoin]] when the raw posting self-join is provably
    * ≤[[RawRowsPerPosting]] rows per posting (the hot-shingle-free
    * common case — no per-doc ranking, no verify pass),
    * [[prefixFiltered]] when a hot element would make the raw join
    * quadratic. Result-identical either way (SetSimJoinSpec pins all
    * three strategies on flat and skewed fixtures). */
  def jaccardJoin(df: DataFrame, idCol: String, blockCol: String,
      setCol: String, nCol: String, tau: Double,
      strategy: Strategy = Strategy.Auto): DataFrame = {
    val chosen = strategy match {
      case Strategy.Auto => choosePostingStrategy(df, idCol, blockCol, setCol)
      case s => s
    }
    chosen match {
      case Strategy.Prefix =>
        prefixFiltered(df, idCol, blockCol, setCol, nCol, tau)
      case _ => countJoin(df, idCol, blockCol, setCol, nCol, tau)
    }
  }

  def prefixFiltered(df: DataFrame, idCol: String, blockCol: String,
      setCol: String, nCol: String, tau: Double): DataFrame = {
    val posting = df.select(col(idCol), col(blockCol), col(nCol),
      explode(col(setCol)).as("s"))
    val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
    val ranked = posting.join(freq, Seq("s"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("df"), col("s"))))
      .filter(col("pos") <= col(nCol) - ceil(col(nCol) * tau) + 1)
      .select(col(idCol), col(blockCol), col("s"), col(nCol))
    val a = ranked.select(col(idCol).as("id_a"), col(blockCol),
      col("s"), col(nCol).as("na"))
    val b = ranked.select(col(idCol).as("id_b"), col(blockCol),
      col("s"), col(nCol).as("nb"))
    val pairs = a.join(b, Seq(blockCol, "s"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("na").cast("double") * tau <= col("nb") &&
        col("nb").cast("double") * tau <= col("na"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sa = df.select(col(idCol).as("id_a"), col(setCol).as("set_a"),
      col(nCol).as("na"))
    val sb = df.select(col(idCol).as("id_b"), col(setCol).as("set_b"),
      col(nCol).as("nb"))
    val inter = size(array_intersect(col("set_a"), col("set_b"))).cast("double")
    pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (inter / (col("na") + col("nb") - inter)).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
