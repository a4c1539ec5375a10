package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Utility main (test scope): per-batch wall breakdown of the streaming
  * admission entries on the ENTRY's own 4-chunk staging — the probe
  * behind per-entry bench investigations (TimeQuery gives the total;
  * this splits it by micro-batch and tier). */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val staged = graft.queries.StreamingQ.stageFrameChunks(
      graft.core.Tables(spark, dir, "documents"),
      Seq(col("doc_id")), "probe4", 4, blockBytes = Some(64L * 1024))
    val files = java.nio.file.Files.list(staged).iterator().asScala
      .toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      .sortBy(_.getFileName.toString)
    def run(tag: String)(attach: (org.apache.spark.sql.DataFrame, String, String)
        => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val landing = java.nio.file.Files.createTempDirectory(s"probe_l$tag")
      val state = java.nio.file.Files.createTempDirectory(s"probe_s$tag")
      val ck = java.nio.file.Files.createTempDirectory(s"probe_c$tag")
      val stream = spark.readStream
        .schema(spark.read.parquet(staged.toString).schema)
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      val q = attach(stream, state.toString, ck.toString)
      try files.zipWithIndex.foreach { case (f, i) =>
        val dst = landing.resolve(f.getFileName.toString)
        java.nio.file.Files.copy(f, dst)
        dst.toFile.setLastModified(f.toFile.lastModified())
        val t0 = System.nanoTime()
        q.processAllAvailable()
        println(f"PROBE $tag batch$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } finally q.stop()
    }
    // twice each: second run is post-JIT steady state
    (1 to 2).foreach { r =>
      run(s"lsh$r")(graft.streaming.StreamDedup.lshAdmit(_, _, _))
      run(s"winnow$r")(graft.streaming.StreamDedup.winnowAdmit(_, _, _))
    }
    spark.stop()
  }
}
