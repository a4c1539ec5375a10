// Plan audit scratch: sbt -batch "runMain graft.ExplainProbe <names...>"
// prints the formatted physical plan of each named query entry at sf0.001.
package graft

import org.apache.spark.sql.SparkSession

object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
