package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-SQ: cluster-pruned SQ8 residual search — recall with rerank,
  * nprobe monotonicity, in-cluster near-exactness, roundtrip,
  * frozen-quantizer insert. */
class IvfSqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val K = 10
  private val NQ = 20

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < NQ)
    .select(col("vec_id").as("qid"), col("embedding").as("qv")).cache()

  private lazy val exact: Map[Long, Set[Long]] = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorF.l2Dist(col("embedding"), col("qv")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recall(found: DataFrame): Double = {
    val got = found.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exact.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    per.sum / per.size
  }

  private lazy val model = IvfSq.build(emb, "vec_id", "embedding", kCoarse = 8)

  test("pruned SQ8 search + rerank keeps a recall floor; nprobe helps") {
    val r3 = recall(model.searchRerank(queries, "qid", "qv", K,
      nprobe = 3, shortlist = 100, vectors = emb, vecCol = "embedding"))
    val r8 = recall(model.searchRerank(queries, "qid", "qv", K,
      nprobe = 8, shortlist = 100, vectors = emb, vecCol = "embedding"))
    info(f"IVF-SQ recall@$K nprobe=3: $r3%.3f, nprobe=8: $r8%.3f")
    // residual SQ8 is near-exact in-cluster, so recall is bounded by the
    // coarse probe misses alone — distinctly above the 1-bit sibling
    assert(r3 >= 0.5)
    assert(r8 >= r3)
    // all probes = no coarse misses: the 8-bit shortlist is essentially
    // the exact ranking
    assert(r8 >= 0.95)
  }

  test("save/load roundtrip serves identical results") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivfsq").toString
    IvfSq.save(model, path)
    val loaded = IvfSq.load(spark, path, "vec_id")
    assert(loaded.mins.toSeq == model.mins.toSeq)
    assert(loaded.scales.toSeq == model.scales.toSeq)
    val a = model.searchRerank(queries, "qid", "qv", K, 3, 100, emb, "embedding")
      .collect().map(_.toSeq).toSet
    val b = loaded.searchRerank(queries, "qid", "qv", K, 3, 100, emb, "embedding")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("insert assigns + encodes against frozen centroids + grid and serves new rows") {
    val base = emb.filter(col("vec_id") >= 100)
    val extra = emb.filter(col("vec_id") < 100)
    val m0 = IvfSq.build(base, "vec_id", "embedding", kCoarse = 8)
    val m1 = IvfSq.insert(m0, extra, "embedding")
    assert(m1.appends == 1)
    assert(m1.codes.count() == 500)
    // frozen quantizer: old rows' (cluster, sig) untouched
    val before = m0.codes.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSeq
    val after = m1.codes.filter(col("vec_id") >= 100).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)).toSeq
    assert(before == after)
    val probe = extra.filter(col("vec_id") === 3)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m1.searchRerank(probe, "qid", "qv", k = 1,
      nprobe = 8, shortlist = 50, vectors = emb, vecCol = "embedding").collect()
    assert(top.length == 1 && top(0).getLong(1) == 3L)
  }
}
