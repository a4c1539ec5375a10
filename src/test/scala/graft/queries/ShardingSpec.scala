package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the split / epoch / shard entries that the cell-exact
  * oracle can state but not EXPLAIN: determinism under re-partitioning,
  * the expected-copies arithmetic of the epoch plan, shard balance, and
  * the one-exchange plan shape of the shard shuffle.
  */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("split assignment is stable under corpus growth (prefix property)") {
    // the split of a document depends only on its own id: RE-RUNNING the
    // entry over a materially smaller corpus (a strict subset staged as
    // its own documents table) yields the same assignment for every
    // surviving document — the property that lets a growing corpus keep
    // its historical holdout. Filtering the full-corpus OUTPUT would not
    // catch a row-count-dependent split (ntile/percent_rank would pass
    // that); running on a different-sized input does.
    val full = Sharding.q_split_holdout.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subDir = java.nio.file.Files.createTempDirectory("graft_split_sub")
    subDir.toFile.deleteOnExit()
    val docs = graft.core.Tables(spark, sf, "documents")
    docs.filter(docs("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(s"$subDir/documents.parquet")
    val sub = Sharding.q_split_holdout.run(spark, subDir.toString)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(sub.nonEmpty && sub.size < full.size)
    sub.foreach { case (id, s) => assert(full(id) == s,
      s"doc $id reassigned $s after corpus shrank — split is size-dependent") }
  }

  test("epoch plan realizes the weights: copies per doc is floor(w) or ceil(w)") {
    import spark.implicits._
    val perDoc = Sharding.q_epoch_mix.run(spark, sf)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val langs = graft.core.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "lang").as[(Long, String)].collect().toMap
    // the PRODUCTION weight table, not a re-declared copy — if the
    // weights change, these assertions follow them automatically
    val w = Sharding.EpochW.toMap
    langs.foreach { case (id, lang) =>
      val wl = w(lang)
      val n = perDoc.getOrElse(id, 0L)
      assert(n == math.floor(wl).toLong || n == math.ceil(wl).toLong,
        s"doc $id ($lang, w=$wl) got $n copies")
    }
    // fractional realization: the mean copy count over each language
    // tracks its weight (hash threshold ⇒ binomial around w - floor(w))
    w.foreach { case (lang, wl) =>
      val ids = langs.collect { case (id, l) if l == lang => id }
      val mean = ids.map(perDoc.getOrElse(_, 0L)).sum.toDouble / ids.size
      assert(math.abs(mean - wl) < 0.15,
        s"$lang mean copies $mean vs weight $wl")
    }
  }

  test("shards are balanced and positions are a permutation per shard") {
    import spark.implicits._
    val rows = Sharding.q_shuffle_shards.run(spark, sf)
      .as[(Long, Long, Long)].collect()
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 16L).toSet))
    val sizes = byShard.values.map(_.length)
    // md5-uniform assignment over 500 docs into 16 shards: no shard
    // should be pathologically loaded (expected ~31, allow wide slack)
    assert(sizes.max <= 3 * sizes.min + 10, s"shard skew: $sizes")
    byShard.values.foreach { s =>
      assert(s.map(_._3).sorted.toSeq == (1L to s.length).toSeq,
        "positions are not a dense 1..n permutation")
    }
  }

  test("shard shuffle plans as hash-partitioned window, no global sort before ranking") {
    // the window must partition by shard (bounded per-shard sorts at
    // 100 TB); the only global sort allowed is the presentation orderBy
    // AFTER ranking
    val p = Sharding.q_shuffle_shards.run(spark, TestSpark.sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
    // the ranking exchange hashes on the SHARD key — one exchange, each
    // shard a bounded partition
    assert(p.contains("hashpartitioning(shard"),
      s"window exchange must hash-partition by shard:\n$p")
    // exactly one GLOBAL sort (formatted Sort arguments carry the global
    // flag: '..., true, 0' global / '..., false, 0' per-partition): the
    // presentation orderBy. The window's own sort must stay per-shard.
    val globalSorts = "\\], true, 0".r.findAllIn(p).length
    assert(globalSorts == 1,
      s"expected exactly the presentation orderBy as a global sort, found $globalSorts:\n$p")
    val localSorts = "\\], false, 0".r.findAllIn(p).length
    assert(localSorts >= 1, s"window must sort within shard partitions:\n$p")
  }

  test("weighted sample tilts toward heavy docs and stays exactly k") {
    import org.apache.spark.sql.functions.{avg, col}
    val out = Sharding.q_sample_weighted.run(spark, sf).cache()
    assert(out.count() == 100L)
    val sampleMean = out.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = graft.core.Tables(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    // w = n_chars + 1, so the length-weighted draw must pull the sample
    // mean above the corpus mean (A-ES inclusion ∝ weight; at 100 of
    // 500 docs the tilt is far outside hash noise)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean ≤ corpus mean $corpusMean")
  }
}
