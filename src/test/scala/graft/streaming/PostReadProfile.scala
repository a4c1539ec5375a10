package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Companion probe to [[ContainProfile]]: time the per-batch POSTING
  * READ under the two at-rest layouts a finished ScaleStream run left
  * behind — flat batch dirs (no fold) vs the bucket-partitioned
  * compacted base (fold cadence) — plus the bucket-pruned read path
  * (`StreamDedup.postingState`) against each.
  *
  * Usage: sbt "Test/runMain graft.streaming.PostReadProfile
  *   <flatStateDir> <foldedStateDir>"
  */
object PostReadProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PostReadProfile <flatStateDir> <foldedStateDir>")
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val walls = (0 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"POST-READ $name%-14s min=${walls.tail.map(_._1).min}%.3f s" +
        f" rows=${walls.head._2}")
    }

    Seq("flat" -> args(0), "folded" -> args(1)).foreach { case (tag, root) =>
      val shAll = spark.read.parquet(s"$root/sh")
      val lastBatch = shAll.agg(max(col("batch")))
        .collect()(0).get(0).toString.toInt
      val d = shAll.filter(col("batch") === lastBatch)
        .select("doc_id", "sh", "nsh").cache()
      d.count()
      timed(s"$tag/union") {
        StreamDedup.postingState(spark, root, lastBatch, d)
          .map(_.count()).getOrElse(0L) }
      d.unpersist()
    }

    // TRIGGER-REGIME demonstration (the regime the bucketed layout is
    // FOR): a production trigger is a few docs against a huge corpus,
    // so its distinct-shingle count sits far below a deployment-sized
    // bucket count and partition pruning skips almost all of the base.
    // Rebuild the flat state's postings under B=2048 buckets, land them
    // flat AND bucket-partitioned, then time a 3-doc trigger's posting
    // read against each (the isin filter is a pushed data filter on the
    // flat layout, a partition-pruning filter on the bucketed one).
    val B = 2048
    val root = args(0)
    val post = spark.read.parquet(s"$root/post").select(col("doc_id"),
      col("g"), pmod(col("g"), lit(B.toLong)).cast("int").as("b"))
    val demo = java.nio.file.Files.createTempDirectory("graft_postdemo")
    demo.toFile.deleteOnExit()
    post.coalesce(4).write.parquet(s"$demo/flat")
    post.repartition(8, col("b")).write.partitionBy("b")
      .parquet(s"$demo/bucketed")
    val trigger = spark.read.parquet(s"$root/sh")
      .orderBy(col("doc_id")).limit(3)
      .select(explode(transform(col("sh"), s => xxhash64(s))).as("g"))
      .select(pmod(col("g"), lit(B.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    println(s"[trigger] 3 docs hit ${trigger.size} of $B buckets " +
      f"(${100.0 * trigger.size / B}%.1f%%)")
    timed("trig/flat") { spark.read.parquet(s"$demo/flat")
      .filter(col("b").isin(trigger: _*)).select("doc_id", "g").count() }
    timed("trig/bucketed") { spark.read.parquet(s"$demo/bucketed")
      .filter(col("b").isin(trigger: _*)).select("doc_id", "g").count() }
    spark.stop()
  }
}
