package graft.index

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GKMeans-parity size-penalized quantizer (_gkmeans.py:165-175's
  * size-decay objective): balance, determinism, and recall floor. */
class BalancedIvfSpec extends AnyFunSuite {
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

  private def sizes(m: IvfIndex.Model): Array[Long] =
    m.assign.groupBy("cluster").count().collect().map(_.getLong(1))

  test("size-penalized quantizer tightens posting-list spread") {
    val plain = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    val bal = IvfIndex.build(emb, "vec_id", "embedding", k = 8,
      balance = true)
    val sp = sizes(plain); val sb = sizes(bal)
    info(s"plain sizes ${sp.sorted.mkString(",")} max=${sp.max}")
    info(s"balanced sizes ${sb.sorted.mkString(",")} max=${sb.max}")
    assert(sb.sum == 500 && sp.sum == 500) // both full coverage
    assert(sb.max <= sp.max) // the size penalty can only tighten the top
    assert(sb.length == 8)  // no cluster starved to death
  }

  test("balanced fit keeps the recall floor (nprobe=3 of 8)") {
    val bal = IvfIndex.build(emb, "vec_id", "embedding", k = 8,
      balance = true)
    val r = recall(bal.search(queries, "qid", "qv", K, nprobe = 3))
    info(f"balanced IVF recall@$K = $r%.3f")
    assert(r >= 0.6)
  }

  test("balanced fit is deterministic") {
    val a = IvfIndex.build(emb, "vec_id", "embedding", k = 8, balance = true)
    val b = IvfIndex.build(emb, "vec_id", "embedding", k = 8, balance = true)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
  }
}
