package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is the at-rest half of the shuffle-minimization story: two
  * tables bucketed by the same key join WITHOUT a shuffle exchange —
  * the layout a 100 TB fact/fact join (lineitem ⋈ orders) would be
  * written in so every daily query skips both sides' exchanges. */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previously-killed run can leave the managed location behind,
    // which CREATE TABLE then refuses
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = new java.io.File(wh, name)
    if (dir.exists())
      scala.reflect.io.Directory(
        scala.reflect.io.File(dir.getPath).toDirectory.jfile).deleteRecursively()
  }

  test("same-key bucketed tables join with no shuffle exchange") {
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_orderdate")
    val l = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    dropTable("b_orders"); dropTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")

    // force the sort-merge path: with broadcast allowed these small test
    // tables take a BroadcastHashJoin and prove nothing about bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // correctness: same rows as the unbucketed join
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected && expected > 0)
      // the point: bucket-aligned scan-to-join — neither side shuffles
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      dropTable("b_orders"); dropTable("b_lineitem")
    }
  }
}
