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

  /** Asymmetric CONTAINMENT join: all ordered (a, b) pairs with
    * |A∩B| ≥ (tauNum/tauDen)·|A| — "a is contained in b". The threshold
    * is one-sided, so the PPJoin size band does not apply (b may be
    * arbitrarily larger than a); instead the prefix lemma applies
    * one-sided: if a misses at most |A| − ⌈τ·|A|⌉ of its elements in B,
    * then among a's first |A| − ⌈τ·|A|⌉ + 1 elements IN ANY FIXED ORDER
    * at least one is shared with B. Ordering a's elements rarest-first
    * by global document frequency makes that prefix the cheapest
    * possible postings: hot shingles (the boilerplate/quote corpora
    * containment targets) fall OUTSIDE every a-prefix, so a shingle
    * shared by m docs contributes m a-side·m b-side = m² pairs in a raw
    * posting join but only (few rare a-prefix entries)·m here.
    * B-side emits ALL postings (the lemma binds only a's side);
    * survivors verify with an exact distinct-set intersection and the
    * integer cross-multiplication n_shared·tauDen ≥ |A|·tauNum — no
    * float boundary. τ is passed as a rational (tauNum/tauDen) so the
    * prefix length ⌈τ·|A|⌉ folds in exact integer arithmetic.
    *
    * Output: (id_a, id_b, n_shared, na) — ordered pairs; mutual
    * containment emits both directions. Input sets must be distinct
    * (array_intersect counts distinct matches).
    * Reference relation: RefinedWeb-style quote-inclusion checks; the
    * symmetric sibling is [[countJoin]]/[[prefixFiltered]]. */
  def containmentJoin(df: DataFrame, idCol: String, blockCol: String,
      setCol: String, nCol: String, tauNum: Int, tauDen: Int): DataFrame = {
    val pairs =
      containmentCandidates(df, idCol, blockCol, setCol, nCol, tauNum, tauDen)
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
