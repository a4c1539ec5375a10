package graft.queries

import graft.core.Tables
import graft.functions.TextF
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LAST mile of a training-data pipeline — what happens after
  * curation (Corpus/Dedup) decides WHICH documents survive: holding out
  * eval data, materializing a source-weighted epoch plan, and shuffling
  * the corpus into training shards. All three are deterministic
  * hash-driven assignments (TextF.h32: the md5-prefix hash both engines
  * compute identically), so every entry is cell-exact against the DuckDB
  * oracle — no RNG state, no partition-order dependence, re-runnable
  * byte-for-byte on any cluster size, which is exactly the property a
  * 100 TB pipeline needs from its split/shuffle step (a `rand()` split
  * changes under retries and repartitioning; a hash split never does).
  */
object Sharding {
  import TextF._

  /** Deterministic train/val/test holdout: each document's salted hash
    * bucket in [0, 1000) maps to train (<980) / val (<990) / test (rest)
    * — the 98/1/1 split a pretraining corpus reserves for in-training
    * eval. Per-doc assignment is pure projection (no shuffle at all at
    * 100 TB: the split column is computed scan-side and survives any
    * later partitioning), and membership is stable under corpus growth —
    * adding documents never reassigns an existing one, unlike an
    * ntile/percent_rank split whose boundaries move with the row count. */
  val q_split_holdout = Q(
    "q_split_holdout",
    (s, dir) => {
      val bucket = pmod(h32s("split#", col("doc_id")), lit(1000))
      Tables(s, dir, "documents")
        .select(col("doc_id"), bucket.cast("long").as("bucket"))
        .withColumn("split",
          when(col("bucket") < 980, "train")
            .when(col("bucket") < 990, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 980 THEN 'train'
      |       WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, ${Sql.h32("'split#' || doc_id")} % 1000 AS bucket
      |      FROM documents)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Per-language epoch weights for [[q_epoch_mix]] — the "books × 2.5,
    * code × 3" style up/down-sampling factors of an LLM data recipe
    * (fractional part realized by hash threshold, so a 1.2-epoch corpus
    * repeats every document once and a deterministic 20% of them twice). */
  private[queries] val EpochW: Seq[(String, Double)] =
    Seq("en" -> 1.2, "de" -> 2.0, "es" -> 0.5, "fr" -> 1.0, "zh" -> 2.7)

  /** Source-weighted epoch plan: materialize (doc_id, copy) rows where
    * language `l` contributes ⌈w_l⌉ candidate copies per document and the
    * fractional copy survives a per-document hash threshold — the
    * deterministic realization of "train for w epochs over this slice"
    * (the mixture-weight DESIGN lives in q_mixture_weights; this entry is
    * the plan a dataloader actually consumes). Expected copies per doc =
    * exactly w_l; which documents carry the extra copy is hash-pinned, so
    * the plan is reproducible and resumable. Spark shape: broadcast
    * 5-entry weight map, explode(sequence) fan-out, scan-side filter —
    * one projection pass, no shuffle, no RNG. */
  val q_epoch_mix = Q(
    "q_epoch_mix",
    (s, dir) => {
      val w = coalesce(
        element_at(typedLit(EpochW.toMap), col("lang")), lit(1.0))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), w.as("w"),
          pmod(h32s("epoch#", col("doc_id")), lit(1000)).as("b"))
        .select(col("doc_id"), col("w"), col("b"),
          explode(sequence(lit(0L), ceil(col("w")).cast("long") - 1)).as("copy"))
        .filter(col("copy") < floor(col("w")) ||
          col("b") < round(col("w") * 1000) - floor(col("w")) * 1000)
        .select(col("doc_id"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    },
    Some(s"""
      |WITH weighted AS (
      |  SELECT doc_id,
      |    CASE lang ${EpochW.map { case (l, v) => s"WHEN '$l' THEN $v" }
                .mkString(" ")} ELSE 1.0 END AS w,
      |    ${Sql.h32("'epoch#' || doc_id")} % 1000 AS b
      |  FROM documents)
      |SELECT doc_id, copy
      |FROM weighted, UNNEST(range(0, CAST(ceil(w) AS BIGINT))) AS t(copy)
      |WHERE copy < floor(w) OR b < round(w * 1000) - floor(w) * 1000
      |ORDER BY doc_id, copy
      |""".stripMargin))

  /** Deterministic corpus shuffle into training shards: shard = salted
    * hash mod 16, position = rank of a SECOND independent salted hash
    * within the shard (ties by doc_id). Together these are the global
    * random shuffle every pretraining run does once before writing
    * shards — expressed so Spark executes it as ONE hash-partitioned
    * exchange plus a per-shard sort (the window's partitioning IS the
    * shard partitioning; at 100 TB the same plan is
    * `repartition($"shard").sortWithinPartitions($"h") .write`, each
    * shard a bounded sort, never a global one). Hash-derived order means
    * the "shuffle" is identical across retries, cluster sizes, and input
    * layouts — a property torn shards can be healed from. */
  val q_shuffle_shards = Q(
    "q_shuffle_shards",
    (s, dir) => {
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("h"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          pmod(h32s("shard#", col("doc_id")), lit(16)).cast("long").as("shard"),
          h32s("pos#", col("doc_id")).as("h"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
      |    AS BIGINT) AS pos
      |FROM (SELECT doc_id,
      |        ${Sql.h32("'shard#' || doc_id")} % 16 AS shard,
      |        ${Sql.h32("'pos#' || doc_id")} AS h
      |      FROM documents)
      |ORDER BY doc_id
      |""".stripMargin))

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES
    * priority sampling): keep the k = 100 documents with the largest
    * key u^(1/w) — equivalently the largest ln(u)/w — where w is the
    * document's weight (n_chars + 1: sample long documents more often,
    * the "fill the context windows" subsample) and u is a DETERMINISTIC
    * uniform from the salted 60-bit hash, u = (h60+1)/2^60 ∈ (0, 1].
    * The hash-driven u makes the draw reproducible under retries and
    * repartitioning — same property as the holdout split — while still
    * being a mathematically correct weighted sample over any
    * non-adversarial id set.
    *
    * Cross-engine exactness: ln(u) is the only libm call — rounded to
    * 6 dp and lifted to BIGINT micros (the lmFold discipline); the
    * ranking key u_mu/w is then ONE IEEE division of exact integers,
    * bit-identical on both engines (no libm), and ties break on doc_id.
    * Scale shape: pure projection + global top-k — plans as
    * TakeOrderedAndProject (≤k rows per partition into the final
    * merge), no shuffle of the corpus, no window. */
  val q_sample_weighted = Q(
    "q_sample_weighted",
    (s, dir) => {
      val k = 100
      Tables.spread(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"))
        .withColumn("u_mu",
          round(round(log(
            (h60(concat(lit("aes#"), col("doc_id"))) + 1).cast("double") /
              lit(1152921504606846976d)), 6) * lit(1e6)).cast("long"))
        .withColumn("key",
          col("u_mu").cast("double") / (col("n_chars") + 1).cast("double"))
        .orderBy(col("key").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      |WITH keyed AS (
      |  SELECT doc_id, n_chars,
      |    CAST(round(round(ln((${Sql.h60("'aes#' || doc_id")} + 1)::DOUBLE
      |        / 1152921504606846976.0), 6) * 1000000, 0) AS BIGINT) AS u_mu
      |  FROM documents),
      |picked AS (
      |  SELECT doc_id, n_chars
      |  FROM keyed
      |  ORDER BY u_mu::DOUBLE / (n_chars + 1)::DOUBLE DESC, doc_id
      |  LIMIT 100)
      |SELECT doc_id, n_chars FROM picked ORDER BY doc_id
      |""".stripMargin))

  val all: Seq[Q] = Seq(q_split_holdout, q_epoch_mix, q_shuffle_shards,
    q_sample_weighted)
}
