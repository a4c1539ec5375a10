package graft.queries

import graft.core.Tables
import graft.functions.VectorF._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-compression surface: int8 scalar quantization and 1-bit
  * binarization with Hamming-distance search. The reference stores raw
  * float32 vectors (radient/tasks/sinks/local/gann.py:196-216,
  * orm/vector.py:44); at 100 TB of embeddings the standard scale move is
  * to compress the stored vectors — 4x for int8, 32x for binary — and
  * run the coarse search over the compressed form with an exact float
  * rerank on the short candidate list (the same two-stage shape as the
  * GANN/IVF probes in graft.index).
  *
  * Both operators here are deterministic and oracle-checked:
  *  - quantization is a pure per-row projection (no shuffle at all —
  *    it pipelines into whatever scan/write surrounds it);
  *  - the binary-signature build is one narrow pass (64 floats -> two
  *    longs), the probe side is broadcast, and the per-query top-k is
  *    pruned by WindowGroupLimit before the final shuffle, so at scale
  *    only ~k rows per partition move.
  */
object VectorCompress {

  /** Symmetric per-vector int8 quantization: scale = max|x_i|,
    * q_i = floor(x_i * 127 / scale + 0.5) in [-127, 127] (half-up,
    * identical fold in both engines; all-zero vectors quantize to zero).
    * Long format over the first 50 vectors keeps the oracle output
    * bounded while checking every lane exactly. */
  val q_vec_quantize = Q(
    "q_vec_quantize",
    (s, dir) => {
      Tables(s, dir, "embeddings")
        .filter(col("vec_id") < 50)
        .withColumn("scale",
          array_max(transform(col("embedding"), x => abs(x.cast("double")))))
        .select(col("vec_id"), col("scale"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          when(col("scale") === 0.0, 0L)
            .otherwise(floor(col("v").cast("double") * 127.0 / col("scale") + 0.5))
            .as("qv"),
          round(col("scale"), 9).as("scale"))
        .orderBy(col("vec_id"), col("pos"))
    },
    Some("""
      |SELECT vec_id, i AS pos,
      |  CASE WHEN scale = 0 THEN 0
      |       ELSE CAST(floor(embedding[i + 1]::DOUBLE * 127.0 / scale + 0.5) AS BIGINT)
      |  END AS qv,
      |  round(scale, 9) AS scale
      |FROM (SELECT vec_id, embedding,
      |        list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
      |        unnest(range(0, len(embedding))) AS i
      |      FROM embeddings WHERE vec_id < 50)
      |ORDER BY vec_id, pos
      |""".stripMargin))

  /** Pack sign bits `from..from+31` of a float vector into one
    * (positive) long: bit j set iff v[from+j] > 0. Two 32-bit halves
    * dodge the BIGINT sign bit in both engines. */
  private def packBits(v: Column, from: Int): Column =
    aggregate(sequence(lit(from), lit(from + 31)), lit(0L),
      (acc, i) => acc + when(element_at(v, i + 1).cast("double") > 0.0,
        // 2^(i-from) via call_function: shiftleft's Scala builder only
        // takes a literal shift, but the SQL form accepts a column
        call_function("shiftleft", lit(1L), i - lit(from))).otherwise(0L))

  private def packSql(from: Int): String =
    s"""list_sum(list_transform(range($from, ${from + 32}), i ->
       |  CASE WHEN embedding[i + 1]::DOUBLE > 0 THEN (1::BIGINT << (i - $from))
       |       ELSE 0::BIGINT END))""".stripMargin

  /** Binarized k-NN: sign bits of the 64-d embedding packed into two
    * longs, Hamming distance by XOR+popcount, top-5 per probe (first 10
    * vectors), ties by vec_id. The 1-bit sketch is the 32x-compression
    * coarse filter; graft.queries.VectorSearch.q_knn_brute is the exact
    * rerank stage it would feed at scale. */
  val q_knn_hamming = Q(
    "q_knn_hamming",
    (s, dir) => {
      val sig = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          packBits(col("embedding"), 0).as("b_lo"),
          packBits(col("embedding"), 32).as("b_hi"))
      val probes = sig.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("b_lo").as("q_lo"), col("b_hi").as("q_hi"))
      val w = Window.partitionBy(col("qid")).orderBy(col("hdist"), col("vec_id"))
      sig.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (hammingDist(col("b_lo"), col("q_lo")) +
            hammingDist(col("b_hi"), col("q_hi"))).cast("long").as("hdist"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy(col("qid"), col("rnk"))
    },
    Some(s"""
      |WITH sig AS (
      |  SELECT vec_id, ${packSql(0)} AS b_lo, ${packSql(32)} AS b_hi
      |  FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS qid, c.vec_id,
      |    CAST(bit_count(xor(c.b_lo, q.b_lo)) + bit_count(xor(c.b_hi, q.b_hi)) AS BIGINT) AS hdist
      |  FROM sig q JOIN sig c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 10)
      |SELECT qid, vec_id, hdist, rnk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY hdist, vec_id) AS rnk
      |  FROM scored)
      |WHERE rnk <= 5 ORDER BY qid, rnk
      |""".stripMargin))

  val all: Seq[Q] = Seq(q_vec_quantize, q_knn_hamming)
}
