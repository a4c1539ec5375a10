package graft.sources

import graft.TestSpark
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkTree(): String = {
    val root = Files.createTempDirectory("graft_src").toString
    Files.createDirectories(Paths.get(s"$root/sub/deeper"))
    Files.write(Paths.get(s"$root/a.txt"), "hello world".getBytes)
    Files.write(Paths.get(s"$root/sub/b.png"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$root/sub/deeper/c.wav"), Array[Byte](9, 8, 7, 6))
    root
  }

  test("local source walks recursively and returns file payloads") {
    val root = mkTree()
    val df = Sources.local(spark, root)
    assert(df.count() == 3)
    val row = df.filter(col("path").endsWith("a.txt"))
      .select("content", "length").head()
    assert(new String(row.getAs[Array[Byte]](0)) == "hello world")
    assert(row.getLong(1) == 11L)
  }

  test("glob filter narrows the scan") {
    val root = mkTree()
    assert(Sources.local(spark, root, "*.png").count() == 1)
  }

  test("modality stamping by extension") {
    val root = mkTree()
    val m = Sources.withModality(Sources.local(spark, root))
      .select("path", "modality").collect()
      .map(r => r.getString(0).split('.').last -> r.getString(1)).toMap
    assert(m("txt") == "text" && m("png") == "image" && m("wav") == "audio")
  }

  test("reader registry dispatches by format key") {
    val root = mkTree()
    assert(Sources.reader(spark, "local", root).count() == 3)
    intercept[IllegalArgumentException] {
      Sources.reader(spark, "youtube", root)
    }
  }

  test("quarantine routing: malformed json lines land whole, clean rows parse") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quar")
    dir.toFile.deleteOnExit()
    val f = dir.resolve("batch.jsonl")
    java.nio.file.Files.write(f,
      ("""{"id": 1, "text": "ok one"}""" + "\n" +
        """{"id": 2 "text": "missing comma"}""" + "\n" +
        """{"id": 3, "text": "ok three"}""" + "\n" +
        """not json at all""" + "\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    val (clean, quarantine) =
      Sources.readWithQuarantine(spark, "json", dir.toString, schema)
    assert(clean.columns.toSeq == Seq("id", "text"))
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val raw = quarantine.collect().map(_.getString(0))
    assert(raw.length == 2)
    assert(raw.exists(_.contains("missing comma")) &&
      raw.exists(_.contains("not json at all")),
      s"quarantine must carry the raw lines for replay: ${raw.toSeq}")
    intercept[IllegalArgumentException] {
      Sources.readWithQuarantine(spark, "parquet", dir.toString, schema)
    }
    // a caller schema already claiming _corrupt_record fails loud at the
    // API boundary, not as a duplicate-column error deep in the reader
    intercept[IllegalArgumentException] {
      Sources.readWithQuarantine(spark, "json", dir.toString,
        schema.add("_corrupt_record", StringType))
    }
    ()
  }
}
