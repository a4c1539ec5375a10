package graft.queries

import graft.TestSpark

/** Utility main (test scope): scan fuzz seeds for driver-entry candidates.
  * Whenever the generator's draw stream changes, the fixed `driverSeeds`
  * describe different plans — rerun this
  * (`sbt "Test/runMain graft.queries.FuzzSeedScan"`) and re-pick seeds
  * whose forceAgg plans are non-trivial (rows > 0) and feature-diverse
  * (join kinds, HAVING), then validate them against DuckDB via the
  * oracle gate. */
object FuzzSeedScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = TestSpark.sf0001
    // --window: scan NON-forceAgg plans for window-bearing candidates
    // (shape 5 rank/RANGE variants never draw under forceAgg); report
    // the join rendering so promotion can avoid NULL-extending outer
    // joins (int-with-NULL columns coerce engine-dependently in the
    // pandas/duckdb compare path — aggregates dodge it, windows must
    // pick seeds without dimf joins)
    val window = args.contains("--window")
    // --setop: scan NON-forceAgg plans for set-operation candidates
    // (shape 6 never draws under forceAgg — same reasoning as --window)
    val setop = args.contains("--setop")
    // --full: print the complete SQL (default truncates to 200 chars)
    val full = args.contains("--full")
    // --seeds=1,2,3: scan exactly these seeds instead of 1..max
    val seedList = args.find(_.startsWith("--seeds="))
      .map(_.stripPrefix("--seeds=").split(",").map(_.toInt).toSeq)
    val max = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(200)
    seedList.getOrElse(1 to max).foreach { seed =>
      val p = Fuzz.plan(seed.toLong, forceAgg = !window && !setop)
      if (window && !p.sql.contains("OVER (")) ()
      else if (setop && !Seq("INTERSECT", "EXCEPT", "UNION ALL")
          .exists(p.sql.contains)) ()
      else {
      val rows =
        try p.run(spark, dir).count()
        catch { case e: Throwable => println(s"SEED $seed ERROR $e"); -1L }
      val sql = p.sql.replaceAll("\\s+", " ")
      val feats = Seq(
        if (sql.contains("NOT IN (SELECT")) "NOTIN"
        else if (sql.contains("NOT EXISTS")) "ANTI"
        else if (sql.contains("EXISTS")) "SEMI"
        else if (sql.contains("JOIN")) "JOIN" else "",
        if (sql.contains("JOIN (SELECT")) "OUTER" else "",
        if (sql.contains("rank() OVER")) "RANK" else "",
        if (sql.contains("RANGE BETWEEN")) "RANGEW" else "",
        if (sql.contains("ROWS BETWEEN")) "ROWSW" else "",
        if (sql.contains("HAVING")) "HAVING" else "",
        if (sql.contains("ROLLUP")) "ROLLUP" else "",
        if (sql.contains("CUBE")) "CUBE" else "",
        if (sql.contains("GROUPING SETS")) "GSETS" else "",
        if (sql.contains("INTERSECT ALL")) "INTERSECTALL"
        else if (sql.contains("INTERSECT")) "INTERSECT"
        else if (sql.contains("EXCEPT ALL")) "EXCEPTALL"
        else if (sql.contains("EXCEPT")) "EXCEPT"
        else if (sql.contains("UNION ALL")) "UNIONALL" else "",
        if (sql.contains("(SELECT min") || sql.contains("(SELECT max")) "CORRSUB" else "",
        if (sql.contains("GROUP BY")) "GRP" else "")
        .filter(_.nonEmpty).mkString("+")
      println(s"SEED $seed rows=$rows feats=$feats sql=${
        if (full) sql else sql.take(200)}")
      }
    }
    spark.stop()
  }
}
