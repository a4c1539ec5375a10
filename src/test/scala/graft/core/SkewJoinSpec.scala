package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join is row-identical to the plain join on skewed data") {
    import spark.implicits._
    // 90% of the big side lands on one hot key — the shape AQE's
    // skew splitting handles for sort-merge but a manual salt must
    // reproduce exactly
    val big = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 50).as("k"))
    val small = spark.range(50)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))
    val plain = big.join(small, Seq("k"))
      .select("k", "id", "payload").collect().map(_.toSeq)
    val salted = SkewJoin.salted(big, small, Seq("k"), col("id"), salt = 8)
      .select("k", "id", "payload").collect().map(_.toSeq)
    assert(salted.length == plain.length)
    assert(salted.toSet == plain.toSet)
  }

  test("salt=1 degenerates to the plain join") {
    import spark.implicits._
    val big = Seq((1L, "a"), (2L, "b"), (1L, "c")).toDF("k", "x")
    val small = Seq((1L, "p"), (2L, "q")).toDF("k", "y")
    val out = SkewJoin.salted(big, small, Seq("k"), col("x"), salt = 1)
      .select("k", "x", "y").collect().map(_.toSeq).toSet
    assert(out == Set(Seq(1L, "a", "p"), Seq(1L, "c", "p"), Seq(2L, "b", "q")))
  }

  test("collision-aware salt: every key's slices occupy salt DISTINCT " +
      "shuffle partitions where the naive 0..salt-1 ids collide") {
    import graft.functions.SaltSelect
    val P = 16
    val salt = 8
    val keys = spark.range(200).select(col("id").as("k"))
    def spread(saltVals: org.apache.spark.sql.Column): Map[Long, Long] =
      keys.withColumn("__salt", explode(saltVals))
        // the same exchange the salted join's shuffle builds:
        // HashPartitioning(k, __salt) at width P
        .repartition(P, col("k"), col("__salt"))
        .select(col("k"), spark_partition_id().as("p"))
        .groupBy("k").agg(countDistinct(col("p")).as("np"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aware = spread(transform(sequence(lit(0), lit(salt - 1)),
      i => SaltSelect(hash(col("k")), i, salt, P)))
    assert(aware.values.forall(_ == salt.toLong),
      s"every key must spread over exactly $salt partitions, got " +
        aware.values.groupBy(identity).view.mapValues(_.size).toMap)
    // the birthday problem the selection exists to kill: with plain ids
    // 0..7 hashed into 16 partitions, most keys lose partitions
    val naive = spread(sequence(lit(0), lit(salt - 1)))
    assert(naive.values.exists(_ < salt.toLong),
      "naive salt ids were collision-free on 200 keys — partition model changed?")
  }

  test("salt values stay pairwise distinct per key (row identity), even salt > P") {
    import graft.functions.SaltSelect
    val vals = spark.range(100)
      .select(transform(sequence(lit(0), lit(19)),
        i => SaltSelect(hash(col("id")), i, 20, 8)).as("vs"))
      .select(size(array_distinct(col("vs"))).as("n"))
      .agg(min(col("n"))).head().getInt(0)
    assert(vals == 20,
      "SaltSelect must emit pairwise-distinct candidates per key or the join duplicates rows")
  }

  test("every salt bucket of a hot key finds its small-side match") {
    import spark.implicits._
    val big = spark.range(1000).select(col("id"), lit(42L).as("k"))
    val small = Seq((42L, "hot")).toDF("k", "v")
    val out = SkewJoin.salted(big, small, Seq("k"), col("id"), salt = 16)
    assert(out.count() == 1000) // no row lost to an unmatched bucket
    // the salt genuinely spreads the hot key over many buckets
    val buckets = big.withColumn("s", pmod(hash(col("id")), lit(16)))
      .select("s").distinct().count()
    assert(buckets > 8)
  }
}
