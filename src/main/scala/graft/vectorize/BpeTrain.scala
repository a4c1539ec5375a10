package graft.vectorize

import graft.functions.TextF
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge training (Sennrich et al. 2016) as Spark jobs — the
  * tokenizer-training step in front of a corpus pipeline (the trained
  * pairs feed the same piece-counting surface as q_token_bpe's regex
  * pre-tokenizer).
  *
  * The scalable formulation: merges are learned from the WEIGHTED WORD
  * VOCABULARY, not the corpus — pair statistics per round are an
  * aggregate over (word, count) rows, so 100 TB of text first collapses
  * to a vocabulary-sized table (Zipf ⇒ ≪ corpus) in one shuffle, and
  * each training round touches only that cached table. Each round's
  * symbol state is re-derived from (word, merges-so-far) inside one
  * kernel, so the plan stays constant-depth across rounds instead of
  * growing a lineage chain.
  *
  * Deterministic: best pair per round = max count, ties by (a, b)
  * lexicographic — reproducible on any partitioning.
  */
object BpeTrain {

  /** Standard greedy BPE segmentation of one word under an ordered merge
    * list: start from characters, apply each merge in learned order. */
  private[graft] def applyMerges(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString)
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq.toIndexedSeq
    }
    syms
  }

  /** Weighted word vocabulary of a text column: (word, n) — the ONE
    * corpus-sized shuffle of the whole training run. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    graft.core.Caches.cached(
      graft.core.Tables.spread(df)
        .select(explode(TextF.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n")))

  /** Learn `numMerges` merges from the weighted vocabulary. Per round:
    * one aggregate over the vocab table (adjacent symbol pairs weighted
    * by word count), one 1-row argmax to the driver. */
  def learn(vocabDf: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val spark = vocabDf.sparkSession
    var merges = Vector.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val bc = spark.sparkContext.broadcast(merges)
      val pairsUdf = udf { (w: String) =>
        val syms = applyMerges(w, bc.value)
        (0 until syms.length - 1).map(i => syms(i) + "\u0000" + syms(i + 1))
      }
      val top = vocabDf
        .select(explode(pairsUdf(col("w"))).as("p"), col("n"))
        .groupBy(col("p")).agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), col("p"))
        .limit(1).collect()
      if (top.isEmpty) return merges // vocabulary fully merged
      val Array(a, b) = top(0).getString(0).split('\u0000')
      merges = merges :+ (a, b)
      round += 1
    }
    merges
  }

  /** Segment a text column into learned-BPE pieces (per word, merges
    * applied in order), exploded long-format (doc keyed by `idCol`). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(merges)
    val encUdf = udf { (w: String) => applyMerges(w, bc.value) }
    df.select(col(idCol), explode(TextF.tokens(col(textCol))).as("w"))
      .select(col(idCol), explode(encUdf(col("w"))).as("piece"))
  }
}
