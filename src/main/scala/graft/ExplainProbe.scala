// Plan audit scratch: sbt -batch "runMain graft.ExplainProbe <names...>"
// prints the formatted physical plan of each named query entry (set
// SPARK_GRAFT_SF_DIR to change the dataset, default sf0.001). With
// --time, instead runs each entry twice and prints warm wall seconds.
package graft

import org.apache.spark.sql.SparkSession

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val time = args.contains("--time")
    args.filterNot(_.startsWith("--")).foreach { name =>
      println(s"===== $name =====")
      if (time) {
        SparkEntry.queries(name)(spark, dir).count() // warm codegen/JIT
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } else SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
