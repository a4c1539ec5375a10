package graft.sink

import graft.TestSpark
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed at-rest layout (VectorTable.writeBucketed) makes the
  * co-located-read claim of the dedup/corpus-delta scaladocs runnable:
  * two crawls bucketed by doc_id into the same bucket count join with NO
  * hash Exchange — the only shuffle left in the snapshot-delta plan is
  * the presentation sort. Content equality vs the shuffled path proves
  * the layout changes the plan, not the answer.
  */
class BucketedLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dropTables(names: String*): Unit =
    names.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("snapshot delta over two doc_id-bucketed crawls joins without a hash Exchange") {
    val docs = graft.core.Tables(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val prev = docs.filter(col("doc_id") % 7 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 2, concat(col("text"), lit(" (stale)")))
          .otherwise(col("text")).as("text"))
    dropTables("bl_cur", "bl_prev")
    try {
      VectorTable.writeBucketed(docs, "bl_cur", "doc_id", buckets = 8)
      VectorTable.writeBucketed(prev, "bl_prev", "doc_id", buckets = 8)
      val delta = graft.queries.CorpusOps.snapshotDelta(
        spark.table("bl_cur"), spark.table("bl_prev"), "doc_id", "text")
      val plan = delta.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the join itself must consume the bucket layout: no
      // hash-partitioning Exchange anywhere in the plan (the
      // presentation orderBy's range Exchange is the one allowed)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located merge join:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan did not report bucket selection:\n$plan")
      // same answer as the shuffled (non-bucketed) path
      val got = delta.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = graft.queries.CorpusOps.snapshotDelta(docs, prev, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want)
    } finally dropTables("bl_cur", "bl_prev")
  }

  test("bucketed vector table: norm_sq stamped, search works off the catalog table") {
    import spark.implicits._
    val vecs = (0L until 64L)
      .map(i => (i, Array.tabulate(4)(d => ((i + d) % 7).toDouble)))
      .toDF("id", "embedding")
    dropTables("bl_vec")
    try {
      VectorTable.writeBucketed(vecs, "bl_vec", "id",
        vecCol = Some("embedding"), buckets = 4)
      val t = spark.table("bl_vec")
      assert(t.columns.contains("norm_sq"))
      val hits = VectorTable.search(t, "embedding",
        Seq(1.0, 2.0, 3.0, 4.0), k = 5).collect()
      assert(hits.length == 5)
      assert(hits.map(_.getAs[Double]("distance")).sliding(2)
        .forall(p => p.head <= p.last))
    } finally dropTables("bl_vec")
  }
}
