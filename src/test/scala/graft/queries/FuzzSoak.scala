package graft.queries

import graft.TestSpark

/** Standalone soak runner for the differential fuzzer — the same
  * DataFrame-vs-SQL check FuzzRelationalSpec runs at 1000 plans, at any
  * budget: `sbt "Test/runMain graft.queries.FuzzSoak 10000 [seedBase]"`.
  * Exits nonzero on the first reported divergence so it can gate a
  * longer offline soak without touching the suite's runtime. */
object FuzzSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000L)
    val base = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = TestSpark.spark
    val dir = TestSpark.sf0001
    Seq("region", "nation", "customer", "supplier", "orders", "part",
      "lineitem").foreach { t =>
      graft.core.Tables(spark, dir, t).cache().createOrReplaceTempView(t)
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val failures = Await.result(
      Future.sequence((base until base + n).map { s =>
        Future {
          val p = Fuzz.plan(s)
          val a = p.run(spark, dir).collect().map(_.toString).sorted.toSeq
          val b = spark.sql(p.sql).collect().map(_.toString).sorted.toSeq
          if (a == b) None else Some((s, p.sql))
        }
      }), Duration.Inf).flatten
    failures.take(5).foreach { case (s, sql) =>
      System.err.println(s"DIVERGENCE seed=$s sql=$sql")
    }
    println(s"[soak] ${n} plans from seed $base: ${failures.size} divergences")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
