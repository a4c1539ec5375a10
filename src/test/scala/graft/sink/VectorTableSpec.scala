package graft.sink

import graft.TestSpark
import graft.functions.VectorF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val tablePath = {
    val dir = java.nio.file.Files.createTempDirectory("vectab").toString
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    VectorTable.write(emb, dir, "vec_id", "embedding", partitionCol = Some("label"))
    dir
  }

  test("round-trip keeps rows and adds norm_sq") {
    val t = VectorTable.load(spark, tablePath)
    assert(t.count() == 500)
    assert(t.columns.contains("norm_sq"))
    val r = t.filter(col("vec_id") === 3)
      .select(col("norm_sq"), VectorF.normSq(col("embedding"))).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
  }

  test("filtered l2 search matches brute-force on the filtered subset") {
    val t = VectorTable.load(spark, tablePath).cache()
    val q = t.filter(col("vec_id") === 0).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val got = VectorTable.search(t, "embedding", q, k = 5,
      metric = "l2", filter = Some(col("label") === 5))
    assert(got.select("label").collect().forall(_.getInt(0) == 5))
    val brute = t.filter(col("label") === 5)
      .select(col("vec_id"),
        VectorF.l2Dist(col("embedding"), array(q.map(lit): _*)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0))
    val gotIds = got.select("vec_id").collect().map(_.getLong(0))
    assert(gotIds.sameElements(brute))
  }

  test("dirTag separates dataset dirs that collide under String.hashCode") {
    // "Aa" and "BB" are the canonical 32-bit hashCode collision — under
    // the pre-round-12 String.hashCode tag these two dataset dirs would
    // have shared catalog tables, the second build silently serving the
    // first's delta (round-12 ADVICE). The 60-bit md5 tag keeps them
    // distinct (and stays a valid identifier charset: lowercase hex).
    val a = "/data/crawl-Aa"
    val b = "/data/crawl-BB"
    assert(a.hashCode == b.hashCode) // the collision the old tag had
    assert(VectorTable.dirTag(a) != VectorTable.dirTag(b))
    assert(VectorTable.dirTag(a).matches("[0-9a-f]{15}"))
    // deterministic across calls — memo keys and table names agree
    assert(VectorTable.dirTag(a) == VectorTable.dirTag(a))
  }

  test("cosine search ranks the query vector itself first") {
    val t = VectorTable.load(spark, tablePath).cache()
    val q = t.filter(col("vec_id") === 9).select("embedding")
      .head.getSeq[Float](0).map(_.toDouble)
    val top = VectorTable.search(t, "embedding", q, k = 1, metric = "cosine")
    assert(top.select("vec_id").head.getLong(0) == 9L)
  }
}
