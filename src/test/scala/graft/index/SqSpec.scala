package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar-quantization index: near-exact recall with exact rerank,
  * encode/dequantize error bound, roundtrip, frozen-grid insert,
  * cosine metric, and shortlist monotonicity. */
class SqSpec extends AnyFunSuite {
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

  private lazy val model = SqIndex.build(emb, "vec_id", "embedding")

  test("8-bit codes dequantize within scale/2 per dimension") {
    // the defining property of the uniform grid: for in-range values the
    // round-to-nearest code reconstructs within half a cell
    val v = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).collect()(0)
      .getSeq[Double](0).toIndexedSeq
    val code = SqIndex.encodeOne(v, model.mins, model.scales)
    v.indices.foreach { i =>
      val deq = model.mins(i) + (code(i) & 0xFF) * model.scales(i)
      val cell = model.scales(i)
      // fit-sample min/max may clip out-of-range values to the grid edge;
      // allow the edge distance for those, half a cell inside
      val inRange = v(i) >= model.mins(i) && v(i) <= model.mins(i) + 255 * cell
      if (inRange) assert(math.abs(deq - v(i)) <= cell / 2 + 1e-12)
    }
  }

  test("SQ shortlist + exact rerank is near-exact; wider shortlist helps") {
    val r15 = recall(model.searchRerank(queries, "qid", "qv", K,
      shortlist = 15, vectors = emb, vecCol = "embedding"))
    val r50 = recall(model.searchRerank(queries, "qid", "qv", K,
      shortlist = 50, vectors = emb, vecCol = "embedding"))
    info(f"SQ8 recall@$K shortlist=15: $r15%.3f, shortlist=50: $r50%.3f")
    // 8-bit error is ~scale/2 per dim — the shortlist is essentially the
    // exact ranking, far above the 1-bit BQ floor
    assert(r15 >= 0.9)
    assert(r50 >= r15)
    assert(r50 >= 0.98)
  }

  test("cosine metric serves unit-space neighbours") {
    val m = SqIndex.build(emb, "vec_id", "embedding", metric = "cosine")
    val exactCos: Map[Long, Set[Long]] = {
      val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
      emb.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (lit(1.0) - VectorF.cosine(col("embedding"), col("qv"))).as("dist"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    val got = m.searchRerank(queries, "qid", "qv", K,
        shortlist = 50, vectors = emb, vecCol = "embedding")
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exactCos.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val r = per.sum / per.size
    info(f"SQ8 cosine recall@$K: $r%.3f")
    assert(r >= 0.95)
  }

  test("save/load roundtrip serves identical results") {
    val path = java.nio.file.Files.createTempDirectory("graft_sq").toString
    SqIndex.save(model, path)
    val loaded = SqIndex.load(spark, path, "vec_id")
    assert(loaded.mins.toSeq == model.mins.toSeq)
    assert(loaded.scales.toSeq == model.scales.toSeq)
    val a = model.searchRerank(queries, "qid", "qv", K, 30, emb, "embedding")
      .collect().map(_.toSeq).toSet
    val b = loaded.searchRerank(queries, "qid", "qv", K, 30, emb, "embedding")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("insert encodes against the frozen grid and serves new rows") {
    val base = emb.filter(col("vec_id") >= 100)
    val extra = emb.filter(col("vec_id") < 100)
    val m0 = SqIndex.build(base, "vec_id", "embedding")
    val m1 = SqIndex.insert(m0, extra, "embedding")
    assert(m1.appends == 1)
    assert(m1.codes.count() == 500)
    // old rows' codes untouched (grid frozen)
    val before = m0.codes.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    val after = m1.codes.filter(col("vec_id") >= 100).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(before == after)
    // an inserted vector's own embedding finds it through the rerank
    val probe = extra.filter(col("vec_id") === 7)
      .select(lit(9999L).as("qid"), col("embedding").as("qv"))
    val top = m1.searchRerank(probe, "qid", "qv", k = 1,
      shortlist = 30, vectors = emb, vecCol = "embedding").collect()
    assert(top.length == 1 && top(0).getLong(1) == 7L)
  }

  test("external query batch with colliding ids keeps its true NN when excludeSelf=false") {
    val probe = emb.filter(col("vec_id") === 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = model.searchRerank(probe, "qid", "qv", k = 1,
      shortlist = 30, vectors = emb, vecCol = "embedding",
      excludeSelf = false).collect()
    assert(top.length == 1 && top(0).getLong(1) == 5L)
  }
}
