package graft.functions

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The point of a z-order key: bucketing the sort order bounds BOTH
  * dimensions per bucket, where a single-column sort bounds only one.
  * The user dimension rides as a 16-bit hash (equality-predicate
  * locality); time rides as real minute buckets (range locality). */
class LocalitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events = {
    val raw = graft.core.Tables(spark,
      graft.TestSpark.sf0001, "events")
    raw.select(col("user_id"),
      pmod(TextF.h32(col("user_id").cast("string")), lit(65536L)).as("uh"),
      expr("unix_micros(ts) div 60000000").as("tmin")).cache()
  }

  private def bucketed(df: DataFrame, key: String): DataFrame =
    df.withColumn("b", ntile(16).over(Window.orderBy(col(key))))

  private def meanUsersPerBucket(df: DataFrame, key: String): Double =
    bucketed(df, key).groupBy("b")
      .agg(countDistinct(col("user_id")).as("u"))
      .agg(avg(col("u"))).collect()(0).getDouble(0)

  private def meanTminSpan(df: DataFrame, key: String): Double =
    bucketed(df, key).groupBy("b")
      .agg((max(col("tmin")) - min(col("tmin"))).as("span"))
      .agg(avg(col("span"))).collect()(0).getDouble(0)

  test("z-order bounds both dimensions; single-key sort bounds only one") {
    val z = events.withColumn("z", Locality.zorder16(col("uh"), col("tmin")))
    val nUsers = events.select("user_id").distinct().count().toDouble
    val tminSpanGlobal = events.agg(max("tmin").cast("double") -
      min("tmin")).collect()(0).getDouble(0)

    // sort by time only: time spans collapse, every bucket sees ~all users
    val timeOnlyUsers = meanUsersPerBucket(
      events.withColumn("z", col("tmin")), "z")
    assert(timeOnlyUsers > nUsers * 0.8,
      "single-key time sort should leave users unbounded per bucket")

    // z-order: both the user set AND the time span shrink per bucket
    val zUsers = meanUsersPerBucket(z, "z")
    val zTmin = meanTminSpan(z, "z")
    info(f"z-order buckets: users $zUsers%.1f of $nUsers%.0f, " +
      f"tmin span $zTmin%.0f of $tminSpanGlobal%.0f")
    assert(zUsers < nUsers * 0.6)
    assert(zTmin < tminSpanGlobal * 0.6)
  }

  test("zorder16 interleaves bits exactly") {
    import spark.implicits._
    val out = Seq((5L, 9L)).toDF("a", "b")
      .select(Locality.zorder16(col("a"), col("b")).as("z"))
      .collect()(0).getLong(0)
    // a=0101 at even positions -> 1 + 16; b=1001 at odd -> 2 + 128
    assert(out == 147L)
  }
}
