package graft.queries

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off profile of the winnow fingerprint kernel (round-14 verdict
  * ask: "measure where the 10× winnow batch wall goes — md5 vs shingle
  * assembly vs explode — and either land a cheaper knob or document
  * that md5 is the floor").
  *
  * Stages are cumulative prefixes of [[TextAnalysis.winnowFps]], each
  * forced by an aggregate that cannot be pruned, so stage deltas
  * isolate per-component cost on the SAME input:
  *
  *   tokens    — split/lower/trim only
  *   assemble  — + 3-shingle string assembly (concat_ws over slices)
  *   md5       — + h32 per shingle (the cross-engine hash)
  *   winmin    — + the w=4 sliding array_min (still inside the array)
  *   full      — + array_distinct + explode + the final distinct
  *
  * Usage: sbt "Test/runMain graft.queries.WinnowProfile [sfDir] [copies]"
  * (defaults /root/testdata/sf0.1, 10 copies — the ScaleStream 10×
  * volume). Prints min-of-3 per stage after one untimed warm pass.
  */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = TestSpark.spark
    import graft.functions.TextF._

    val base = graft.core.Tables.spread(
      graft.core.Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    // n offset copies ≈ the ScaleStream replay volume; repartition so
    // the per-doc CPU kernels parallelize (the 64 KB scan-split lesson)
    val docs = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_.unionByName(_)).repartition(64).cache()
    docs.count()

    def stage(name: String)(f: DataFrame => DataFrame): Unit = {
      val walls = (0 to 3).map { _ =>
        val t0 = System.nanoTime()
        f(docs).agg(sum(col("probe"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"WINNOW-STAGE $name%-9s min=${walls.tail.min}%.3f s " +
        f"(reps ${walls.tail.map(w => f"$w%.2f").mkString(", ")})")
    }

    stage("tokens")(d => d.select(
      size(tokens(col("text"))).cast("long").as("probe")))
    stage("assemble")(d => d.select(
      aggregate(transform(shingles(tokens(col("text")), 3),
          s => length(s).cast("long")),
        lit(0L), (a, x) => a + x).as("probe")))
    stage("md5")(d => d.select(
      aggregate(transform(shingles(tokens(col("text")), 3), s => h32(s)),
        lit(0L), (a, x) => a + x).as("probe")))
    stage("winmin")(d => d.select(
      aggregate({
        val hs = transform(shingles(tokens(col("text")), 3), s => h32(s))
        when(size(hs) >= 4,
          transform(sequence(lit(0), size(hs) - 4),
            i => array_min(slice(hs, i + lit(1), lit(4)))))
          .otherwise(array().cast("array<long>"))
      }, lit(0L), (a, x) => a + x).as("probe")))
    stage("full")(d => graft.queries.TextAnalysis.winnowFps(d)
      .select(col("fp").as("probe")))

    spark.stop()
  }
}
