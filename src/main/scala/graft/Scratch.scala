package graft

import graft.core.Tables
import graft.functions.VectorF
import graft.vectorize.{HashEmbed, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

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

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("id"),
        element_at(array(lit("text"), lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 4 + 1).cast("int")).as("modality"),
        col("text").cast(BinaryType).as("data"),
        lit(null).cast(StringType).as("path"))

    time("featurize.count") { Multimodal.featurize(docs, 16).count() }
    time("featurize+explode") {
      Multimodal.featurize(docs, 16)
        .select(col("id"), posexplode(col("embedding")).as(Seq("pos", "v"))).count()
    }
    val binaryOnly = docs.filter(col("modality") =!= "text")
    time("binary branch only + explode") {
      Multimodal.featurize(binaryOnly, 16)
        .select(col("id"), posexplode(col("embedding")).as(Seq("pos", "v"))).count()
    }
    val textDf = docs.filter(col("modality") === "text")
      .select(col("id"), HashEmbed.embed(col("data").cast("string"), 16).as("embedding"))
    time("text hash-embed + explode") {
      textDf.select(col("id"), posexplode(col("embedding")).as(Seq("pos", "v"))).count()
    }
    time("text hash-embed + normalize + explode") {
      textDf.select(col("id"),
        posexplode(VectorF.normalize(col("embedding"))).as(Seq("pos", "v"))).count()
    }
    spark.stop()
  }
}
