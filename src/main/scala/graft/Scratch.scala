package graft

import graft.core.Tables
import graft.functions.TextF
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for perf bisection — not part of the engine surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val cust = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("src"),
        (col("c_nationkey").cast("long") + 10000L).as("dst"),
        lit(1.0).as("weight"))
    val edges = cust.union(
      cust.select(col("dst").as("src"), col("src").as("dst"), col("weight"))).cache()
    time("edges count") { edges.count() }

    val dim = 8
    val lr = edges.select(col("src").as("node")).distinct()
      .select(col("node"),
        graft.vectorize.FastRP.projectionRow(col("node"), dim, 42L).as("vec"))
      .cache()
    time("lr count") { lr.count() }

    def propagate(x: org.apache.spark.sql.DataFrame) =
      edges.join(x, edges("dst") === x("node"))
        .select(edges("src"),
          array_to_vector(transform(col("vec"), v => v * col("weight"))).as("m"))
        .groupBy(col("src").as("node"))
        .agg(vector_to_array(Summarizer.sum(col("m"))).as("vec"))

    time("propagate x1") { propagate(lr).count() }
    val p1 = propagate(lr).cache()
    time("p1 materialize") { p1.count() }
    time("propagate x2 (from cached p1)") { propagate(p1).count() }

    // alternative: explode-position propagate (codegen all the way)
    def propagatePos(x: org.apache.spark.sql.DataFrame) =
      edges.join(x, edges("dst") === x("node"))
        .select(edges("src"), posexplode(col("vec")).as(Seq("pos", "v")),
          col("weight"))
        .groupBy(col("src").as("node"), col("pos"))
        .agg(sum(col("v") * col("weight")).as("v"))
        .groupBy(col("node"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("node"), transform(col("pv"), p => p.getField("v")).as("vec"))

    time("propagatePos x1 (from cached p1)") { propagatePos(p1).count() }
    spark.stop()
  }
}
