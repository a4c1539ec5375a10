package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-grouped k-means: every group is an independent clustering, all
  * trained in the same jobs (_gkmeans.py fit(groups=...) parity). */
class GroupedKMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // two groups with opposite well-separated cluster layouts, so a
  // cross-group leak is immediately visible in the centroids
  private def data = {
    import spark.implicits._
    val ga = Seq.tabulate(20)(i => ("a", Seq(0.0 + i * 0.01, 0.0))) ++
      Seq.tabulate(20)(i => ("a", Seq(10.0 + i * 0.01, 0.0)))
    val gb = Seq.tabulate(20)(i => ("b", Seq(0.0, 5.0 + i * 0.01))) ++
      Seq.tabulate(20)(i => ("b", Seq(0.0, -5.0 - i * 0.01)))
    (ga ++ gb).toDF("g", "v")
  }

  test("each group recovers its own two clusters, batched in one fit") {
    val cents = GroupedKMeans.fit(data, "g", "v", k = 2, iters = 10)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2)))
    assert(cents.length == 4) // 2 groups x 2 clusters
    val a = cents.filter(_._1 == "a").map(_._3.head).sorted
    assert(math.abs(a(0) - 0.095) < 0.2 && math.abs(a(1) - 10.095) < 0.2)
    val b = cents.filter(_._1 == "b").map(_._3(1)).sorted
    assert(math.abs(b(0) + 5.095) < 0.2 && math.abs(b(1) - 5.095) < 0.2)
  }

  test("fit is deterministic across invocations") {
    def run() = GroupedKMeans.fit(data, "g", "v", k = 2, iters = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(run() == run())
  }

  test("assign emits one row per input with the nearest own-group centroid") {
    val cents = GroupedKMeans.fit(data, "g", "v", k = 2, iters = 10)
    val out = GroupedKMeans.assign(data, cents, "g", "v")
    assert(out.count() == 80)
    // every x≈10 point of group a lands in the cluster whose centroid is at x≈10
    val far = out.filter(col("g") === "a" &&
      element_at(col("v"), 1) > 5.0)
    assert(far.select("cluster").distinct().count() == 1)
    assert(far.agg(max(col("dist"))).collect()(0).getDouble(0) < 1.0)
  }

  test("a group smaller than k yields one centroid per distinct row") {
    import spark.implicits._
    val tiny = Seq(("t", Seq(1.0, 1.0))).toDF("g", "v")
    val cents = GroupedKMeans.fit(tiny, "g", "v", k = 4, iters = 3)
    assert(cents.count() == 1)
  }
}
