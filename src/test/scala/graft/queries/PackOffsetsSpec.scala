package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase distributed prefix sum behind the packing family
  * (Corpus.packOffsets): exactness vs the naive per-language window
  * cumsum across shard-size edge cases, and the plan-shape properties
  * that make it scale — the corpus window partitions by (lang, shard)
  * so no task ever holds a whole language, and the base-offset branch
  * reuses the same shuffle instead of re-scanning the corpus.
  */
class PackOffsetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 languages × 120 docs with deterministic pseudo-random token counts
  // (including zeros: empty docs must not perturb downstream offsets)
  private lazy val fixture = (0L until 360L).map { id =>
    (id, "lang" + (id % 3), (id * 2654435761L % 97L) % 19L)
  }.toDF("doc_id", "lang", "n_tok")

  private def naive = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fixture.withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
      .select("doc_id", "lang", "n_tok", "off")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
  }

  // blockDocs edge cases: 1 (every doc its own shard — pure base-offset
  // path), 4 (many small shards), 64 (a few shards), 1e9 (single shard —
  // degenerates to the naive window, pure local path)
  for (b <- Seq(1L, 4L, 64L, 1000000000L))
    test(s"packOffsets(blockDocs=$b) equals the naive per-language window cumsum") {
      val got = Corpus.packOffsets(fixture, b)
        .select("doc_id", "off")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === naive)
    }

  test("the corpus-side window partitions by (lang, shard), never lang alone") {
    // the scale property: every Window whose input is the corpus must
    // include the shard key; the only lang-only window allowed is the
    // cumsum over the tiny per-shard aggregate (child = HashAggregate)
    val p = Corpus.packOffsets(fixture, 4L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val windowArgs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowArgs.nonEmpty)
    val corpusWindows = windowArgs.filter(l => l.contains("n_tok"))
    assert(corpusWindows.nonEmpty, s"no corpus window found:\n$p")
    corpusWindows.foreach { l =>
      assert(l.contains("_shard"), s"corpus window lacks the shard key: $l\n$p")
    }
  }

  test("q_pack_sequences at sf0.001: >1 window group per language and exchange reuse") {
    val s = spark
    s.conf.set("graft.pack.blockDocs", "64")
    // hermetic cache context: if another suite cached the raw documents
    // table, the scans arrive as TableCacheQueryStage and AQE does not
    // reuse exchanges across cache-stage boundaries — the production
    // sessions (Verify/Bench) never cache the raw table, so the reuse
    // property is pinned against that shape, not the polluted one
    graft.core.Tables(s, TestSpark.sf0001, "documents").unpersist(blocking = true)
    try {
      val df = graft.SparkEntry.queries("q_pack_sequences")(s, TestSpark.sf0001)
      val rows = df.collect()
      assert(rows.length > 0)
      // 500 docs / blockDocs=64 ⇒ 8 shards; every language spans >1
      // (lang, shard) group, so no single task saw a whole language
      val shards = rows.map(r => (r.getString(1), r.getLong(0) / 64L)).distinct
      val perLang = shards.groupBy(_._1).map(_._2.length)
      assert(perLang.forall(_ > 1), s"per-lang shard counts: $perLang")
      // the base-offset branch must REUSE the corpus shuffle, not rescan:
      // AQE stage reuse shows up in the final adaptive plan
      val executed = df.queryExecution.executedPlan.toString
      assert(executed.contains("ReusedQueryStage") || executed.contains("ReusedExchange"),
        s"no exchange reuse in executed plan:\n$executed")
    } finally s.conf.unset("graft.pack.blockDocs")
  }
}
