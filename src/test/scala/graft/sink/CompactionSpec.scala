package graft.sink

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Compaction contract: the rewrite is lossless (row multiset identical),
  * lands the planned file count, and never inflates an already-compact
  * dataset. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dataFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))

  private def multiset(dir: String): Map[String, Int] =
    spark.read.parquet(dir).collect().map(_.toString)
      .groupBy(identity).view.mapValues(_.length).toMap

  test("planFiles: ceil division with a floor of one file") {
    assert(Compaction.planFiles(0L, 100L) == 1)
    assert(Compaction.planFiles(1L, 100L) == 1)
    assert(Compaction.planFiles(100L, 100L) == 1)
    assert(Compaction.planFiles(101L, 100L) == 2)
    assert(Compaction.planFiles(1000L, 100L) == 10)
    intercept[IllegalArgumentException] { Compaction.planFiles(10L, 0L) }
  }

  test("fragmented ingest dir compacts to the planned count, losslessly") {
    val in = tmp("graft_compact_in")
    val out = tmp("graft_compact_out")
    // simulate a per-trigger streaming sink: 16 tiny files
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .repartition(16).write.mode("overwrite").parquet(in)
    val frag = dataFiles(in)
    assert(frag >= 8, s"staging should be fragmented, got $frag files")
    val before = multiset(in)
    // target a third of the on-disk bytes per file
    val bytes = Option(new java.io.File(in).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val target = math.max(1L, bytes / 3)
    val (nIn, nOut) = Compaction.compactParquet(spark, in, out, target)
    assert(nIn == frag)
    assert(nOut == Compaction.planFiles(bytes, target),
      s"wrote $nOut files, planned ${Compaction.planFiles(bytes, target)}")
    assert(nOut < frag, "compaction must reduce the file count here")
    assert(multiset(out) == before, "compaction changed the row multiset")
  }

  test("registry sink 'compact' lands and rewrites in one stage") {
    val land = tmp("graft_compact_sink_in")
    val out = tmp("graft_compact_sink_out")
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .repartition(12)
    val compacted = graft.pipeline.Operators.make(spark, "sink", "compact",
      Map("path" -> land, "compactTo" -> out,
        "targetBytes" -> (64L * 1024 * 1024).toString))(Seq(docs), Map.empty)
    assert(compacted.count() == docs.count())
    assert(dataFiles(out) < dataFiles(land),
      "sink compact must reduce the file count here")
    assert(multiset(out) == multiset(land))
  }

  test("in-place compaction is refused, under every path spelling") {
    val in = tmp("graft_compact_same")
    spark.range(10).write.mode("overwrite").parquet(in)
    // identical string, a relative respelling, and a qualified URI all
    // resolve to the same dir — each would let the overwrite delete the
    // scan source (round-12 ADVICE, medium)
    intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, in, in, 1024L)
    }
    intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, in, s"file:$in", 1024L)
    }
    intercept[IllegalArgumentException] {
      val parent = new java.io.File(in).getParent
      val name = new java.io.File(in).getName
      Compaction.compactParquet(spark, in, s"$parent/./$name", 1024L)
    }
    // the registry sink fails fast on the same collision
    intercept[IllegalArgumentException] {
      graft.pipeline.Operators.make(spark, "sink", "compact",
        Map("path" -> in, "compactTo" -> in))(
        Seq(spark.range(1).toDF()), Map.empty)
    }
    // data untouched by the refused calls
    assert(spark.read.parquet(in).count() == 10)
  }

  test("already-compact dataset is not split further") {
    val in = tmp("graft_compact_one_in")
    val out = tmp("graft_compact_one_out")
    spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .coalesce(1).write.mode("overwrite").parquet(in)
    val before = multiset(in)
    // a tiny target would PLAN many files, but a 1-split scan can't be
    // coalesced upward and must pass through unchanged (no shuffle)
    val (nIn, nOut) = Compaction.compactParquet(spark, in, out, 1024L)
    assert(nIn == 1)
    assert(nOut >= 1)
    assert(multiset(out) == before)
  }
}
