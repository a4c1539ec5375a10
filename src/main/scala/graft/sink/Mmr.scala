package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MMR (maximal marginal relevance, Carbonell & Goldstein '98)
  * diversification as a batch rerank operator: for every query group,
  * greedily pick k results maximizing `wRel·rel − wDiv·max-sim-to-
  * selected` (cosine over the candidate embeddings, ties to the lowest
  * id).
  *
  * Runs as ONE aggregate row per query — sorted collect_list → k²
  * greedy kernel → posexplode — so a batch of queries is a plain
  * groupBy(qid) with constant work per group: the candidate list is
  * k-bounded by the retrieval stage in front of it, no matter the
  * corpus size. (The weights are explicit rather than λ/1−λ: `1−0.7`
  * is 0.30000000000000004 in binary64, and the oracle-exact queries
  * need the literal 0.3.)
  */
object Mmr {

  private def greedy(wRel: Double, wDiv: Double) = udf {
    (ids: Seq[Long], rels: Seq[Double], embs: Seq[Seq[Double]], k: Int) =>
      val n = ids.length
      val arr = embs.map(_.toArray).toArray
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var step = 1
      var exhausted = false
      while (!exhausted && step <= math.min(k, n)) {
        var bi = -1; var bs = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!sel.contains(i)) {
            val score =
              if (sel.isEmpty) wRel * rels(i)
              else {
                var ms = Double.NegativeInfinity
                sel.foreach { j =>
                  val c = cos(arr(i), arr(j)); if (c > ms) ms = c
                }
                wRel * rels(i) - wDiv * ms
              }
            if (score > bs) { bs = score; bi = i } // strict > ⇒ lowest id wins ties
          }
          i += 1
        }
        // every remaining score NaN (NaN rel / degenerate embeddings):
        // `score > bs` never fires, bi stays -1 — stop cleanly with the
        // picks so far instead of throwing on ids(-1)
        if (bi < 0) exhausted = true
        else {
          out += ((step.toLong, ids(bi), bs))
          sel += bi
          step += 1
        }
      }
      out.toSeq
  }

  /** Diversify per-query candidate lists. `cands` columns: `qid`
    * (grouping key), `id` (long-castable result id), `rel` (relevance,
    * double), `emb` (vector, castable to array<double>). Returns
    * (qid, step, id, score) with step 1..k per query. */
  def diversify(cands: DataFrame, qid: String, id: String, rel: String,
      emb: String, k: Int, wRel: Double = 0.7, wDiv: Double = 0.3): DataFrame = {
    cands
      .select(col(qid), col(id).cast("long").as("__id"),
        col(rel).cast("double").as("__rel"),
        col(emb).cast("array<double>").as("__emb"))
      .groupBy(col(qid))
      .agg(sort_array(collect_list(struct(col("__id"), col("__rel"), col("__emb"))))
        .as("cs"))
      .select(col(qid), explode(greedy(wRel, wDiv)(
        col("cs").getField("__id"), col("cs").getField("__rel"),
        col("cs").getField("__emb"), lit(k))).as("p"))
      .select(col(qid), col("p._1").as("step"), col("p._2").as(id),
        col("p._3").as("score"))
  }
}
