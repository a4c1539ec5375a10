package graft.index

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The search-time beam probe (GannIndex.routeLeavesBeam): natural
  * spill-routed leaves first, then next-nearest leaves by path slack.
  * Query-side only — the data assignment never changes — so the probe
  * set must be a SUPERSET of the natural one and top-k quality is
  * monotone in `beam`. */
class GannBeamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet").cache()
  private lazy val model =
    GannIndex.build(emb, "vec_id", "embedding",
      leafSize = 50, spill = 0.15, nTrees = 2)
  private lazy val vecs: Seq[Array[Double]] =
    emb.filter(col("vec_id") < 50)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq

  test("beam=1 probe is exactly the natural spill-routed set") {
    vecs.foreach { v =>
      assert(GannIndex.routeForestBeam(model.trees, v, 1) ==
        GannIndex.routeForest(model.trees, v))
    }
  }

  test("the probed leaf set grows monotonically with beam and always " +
      "contains the natural set") {
    vecs.foreach { v =>
      val natural = GannIndex.routeForest(model.trees, v).toSet
      var prev = Set.empty[(Int, Int)]
      Seq(1, 2, 3, 5, 8).foreach { bm =>
        val probed = GannIndex.routeForestBeam(model.trees, v, bm).toSet
        assert(natural.subsetOf(probed), s"beam=$bm dropped a natural leaf")
        assert(prev.subsetOf(probed), s"beam=$bm dropped a beam-${bm}- leaf")
        prev = probed
      }
    }
  }

  test("per-tree probe count is capped at beam (or the natural set size)") {
    vecs.foreach { v =>
      model.trees.foreach { t =>
        val natural = GannIndex.routeLeaves(t, v)
        Seq(2, 4).foreach { bm =>
          val got = GannIndex.routeLeavesBeam(t, v, bm)
          assert(got.size == math.max(natural.size, bm),
            "beam probe must fill up to the requested width")
          assert(got.distinct.size == got.size, "duplicate leaf in probe")
        }
      }
    }
  }

  test("beam probe is deterministic") {
    vecs.take(10).foreach { v =>
      val a = GannIndex.routeForestBeam(model.trees, v, 4)
      val b = GannIndex.routeForestBeam(model.trees, v, 4)
      assert(a == b)
    }
  }

  test("search recall@10 is monotone in beam (candidate superset)") {
    import graft.functions.VectorF
    import org.apache.spark.sql.expressions.Window
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorF.l2Dist(col("embedding"), col("qv")).as("dist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recall(beam: Int): Double = {
      val got = model.search(queries, "qid", "qv", k = 10, beam = beam)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val per = exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size }
      per.sum / per.size
    }
    // a candidate superset exact-ranked can only keep or add true
    // neighbours (anything that displaces a true top-10 member is
    // itself a closer, hence true top-10, member)
    val r1 = recall(1); val r3 = recall(3)
    info(f"gann recall@10 beam=1 $r1%.3f beam=3 $r3%.3f")
    assert(r3 >= r1 - 1e-9, s"beam=3 recall $r3 < beam=1 recall $r1")
  }
}
