package graft

import org.apache.spark.sql.SparkSession

/** Utility main (test scope): standalone steady-state timing of named
  * SparkEntry queries — the per-entry evidence behind SCALE.md ratchet
  * notes when a knob change needs a before/after without a full Bench
  * run. Prints one line per rep; read the min of the post-warm reps
  * (rep 1 pays any memoized model build).
  *
  * `sbt "Test/runMain graft.TimeQuery <sfDir> <name> [name...]"`
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <name> [name...]")
    val dir = args.head
    val names = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val times = (1 to 4).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"TIME $name rep$i $t%.3f s")
        t
      }
      println(f"TIME $name min-post-warm ${times.drop(1).min}%.3f s")
    }
    spark.stop()
  }
}
