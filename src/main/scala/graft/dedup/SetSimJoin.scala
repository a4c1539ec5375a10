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
