package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential testing of the relational surface: every
  * generated plan ([[Fuzz.plan]]) is executed BOTH as its DataFrame-API
  * rendering and as its SQL rendering through `spark.sql` — any
  * divergence is a bug in the generator's renderings or a genuine
  * DataFrame/SQL semantic mismatch. The same generator's fixed-seed
  * plans (`q_fuzz_*`) are cross-checked against DuckDB by the driver's
  * oracle gate each round, so the SQL rendering itself is
  * second-engine-verified. */
class FuzzRelationalSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  // cached for the 1000-plan loop, but unpersisted in afterAll: a cached
  // RAW table scan would otherwise be substituted (CacheManager plan
  // match) into every later suite's plans in this JVM — PlanShapeSpec's
  // pushdown/pruning assertions see an InMemoryRelation instead of the
  // parquet scan and fail.
  private val cachedTables =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]

  private lazy val views: Unit =
    Seq("region", "nation", "customer", "supplier", "orders", "part",
      "lineitem").foreach { t =>
      val df = graft.core.Tables(spark, dir, t).cache()
      cachedTables += df
      df.createOrReplaceTempView(t)
    }

  override def afterAll(): Unit = {
    cachedTables.foreach(_.unpersist())
    super.afterAll()
  }

  private def check(seed: Long): Option[(Long, String, String)] = {
    val p = Fuzz.plan(seed)
    val a = p.run(spark, dir).collect().map(_.toString).sorted.toSeq
    val b = spark.sql(p.sql).collect().map(_.toString).sorted.toSeq
    if (a == b) None
    else Some((seed, p.sql,
      s"df=${a.take(3).mkString("|")} sql=${b.take(3).mkString("|")}"))
  }

  test("1000 generated plans agree between DataFrame API and SQL") {
    views
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // SPARK_GRAFT_FUZZ_PLANS widens the sweep for per-round soaks
    // (e.g. 5000) without making every CI run pay for it
    val n = sys.env.get("SPARK_GRAFT_FUZZ_PLANS")
      .flatMap(_.toLongOption).getOrElse(1000L)
    val failures = Await.result(
      Future.sequence((0L until n).map(s => Future(check(s)))),
      Duration.Inf).flatten
    assert(failures.isEmpty,
      s"${failures.size} divergences, first: ${failures.take(3)}")
  }

  test("driver-facing fuzz entries return rows at sf0.001") {
    views
    Fuzz.all.foreach { q =>
      val n = q.run(spark, dir).count()
      info(s"${q.name}: $n rows")
      assert(n >= 0)
      assert(q.oracle.nonEmpty)
    }
  }
}
