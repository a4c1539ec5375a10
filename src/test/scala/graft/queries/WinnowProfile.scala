package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // own local[32] session — TestSpark's local[4] would throttle the
    // CPU-bound kernels 8x and distort nothing but waste wall-clock
    // (relative stage split is what we're after, but at 3+ min/rep the
    // measurement never lands)
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    // hs is MATERIALIZED via withColumn exactly as winnowFps does — a
    // `val hs = <expr>` referenced inside the window lambda would
    // duplicate the whole tokens→shingles→md5 subtree per window
    // element (Catalyst does no CSE inside HOF lambdas): measured 87 s
    // vs 2.6 s for the same logical stage, an instructive artifact, not
    // a winnow cost
    stage("winmin")(d => d
      .withColumn("hs", transform(shingles(tokens(col("text")), 3),
        s => h32(s)))
      .filter(size(col("hs")) >= 4)
      .select(aggregate(
        transform(sequence(lit(0), size(col("hs")) - 4),
          i => array_min(slice(col("hs"), i + lit(1), lit(4)))),
        lit(0L), (a, x) => a + x).as("probe")))
    stage("full")(d => graft.queries.TextAnalysis.winnowFps(d)
      .select(col("fp").as("probe")))

    spark.stop()
  }
}
