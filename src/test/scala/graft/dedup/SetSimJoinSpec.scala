package graft.dedup

import graft.TestSpark
import graft.functions.TextF
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two candidate-generation strategies must return EXACTLY the same
  * qualifying pairs (prefix filtering is a lossless prune). */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val shingles = spark.read
    .parquet(s"${TestSpark.sf0001}/documents.parquet")
    .withColumn("toks", TextF.tokens(col("text")))
    .select(col("doc_id"), col("lang"),
      TextF.shingleSet(col("toks"), 3).as("sh"))
    .withColumn("nsh", size(col("sh")))
    .cache()

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

  test("prefixFiltered equals countJoin on the documents fixture") {
    for (tau <- Seq(0.5, 0.8)) {
      val cj = pairs(SetSimJoin.countJoin(shingles, "doc_id", "lang", "sh", "nsh", tau))
      val pf = pairs(SetSimJoin.prefixFiltered(shingles, "doc_id", "lang", "sh", "nsh", tau))
      assert(cj == pf, s"strategies diverge at tau=$tau")
      assert(cj.nonEmpty, s"fixture yields no pairs at tau=$tau — test is vacuous")
    }
  }

  test("skewed input: a hot shared element does not change results") {
    import spark.implicits._
    // every set shares the hot element "zz zz zz"; only 1&2 are near-dups
    val df = Seq(
      (1L, Seq("zz zz zz", "a b c", "b c d", "c d e")),
      (2L, Seq("zz zz zz", "a b c", "b c d", "c d e")),
      (3L, Seq("zz zz zz", "p q r", "q r s", "r s t")),
      (4L, Seq("zz zz zz", "u v w", "v w x", "w x y"))
    ).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    val cj = pairs(SetSimJoin.countJoin(df, "doc_id", "lang", "sh", "nsh", 0.9))
    val pf = pairs(SetSimJoin.prefixFiltered(df, "doc_id", "lang", "sh", "nsh", 0.9))
    assert(cj == pf)
    assert(cj.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("jaccardJoin: Raw, Prefix and Auto agree on flat and skewed " +
      "fixtures (round-12 cost-based symmetric join)") {
    import spark.implicits._
    val sts = Seq(SetSimJoin.Strategy.Raw, SetSimJoin.Strategy.Prefix,
      SetSimJoin.Strategy.Auto)
    for (tau <- Seq(0.5, 0.8)) {
      val ref = pairs(SetSimJoin.countJoin(
        shingles, "doc_id", "lang", "sh", "nsh", tau))
      for (st <- sts)
        assert(ref == pairs(SetSimJoin.jaccardJoin(
          shingles, "doc_id", "lang", "sh", "nsh", tau, st)),
          s"jaccardJoin $st diverges at tau=$tau")
      assert(ref.nonEmpty)
    }
    // skewed: every strategy (incl. Auto, which must pick Prefix here —
    // the shared chooser is pinned above) returns the same single pair
    val hot = (0L until 100L).map(i =>
      (i, Seq("zz zz zz") ++ (1 to 4).map(j =>
        if (i < 2) s"p_$j" else s"u${i}_$j"))).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    val ref = pairs(SetSimJoin.countJoin(hot, "doc_id", "lang", "sh", "nsh", 0.9))
    assert(ref.map(p => (p._1, p._2)) == Set((0L, 1L)))
    for (st <- sts)
      assert(ref == pairs(SetSimJoin.jaccardJoin(
        hot, "doc_id", "lang", "sh", "nsh", 0.9, st)), s"$st diverges")
  }

  /** Reference implementation for containment: raw posting self-join +
    * count — the pre-round-11 entry body. containmentJoin must return
    * exactly the same ordered pairs. */
  private def rawContainment(df: org.apache.spark.sql.DataFrame,
      tauNum: Int, tauDen: Int) = {
    val pa = df.select(col("doc_id").as("id_a"), col("lang"),
      explode(col("sh")).as("tok"), col("nsh").as("na"))
    val pb = df.select(col("doc_id").as("id_b"), col("lang"),
      explode(col("sh")).as("tok"))
    pa.join(pb, Seq("lang", "tok"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") * tauDen >= col("na") * tauNum)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("na").cast("long").as("na"))
  }

  private def cPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "n_shared", "na").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("containmentJoin: Raw, Prefix, and Auto all equal the reference " +
      "raw posting join on the documents fixture") {
    val d = shingles.filter(col("nsh") >= 5)
    for ((num, den) <- Seq((8, 10), (1, 2))) {
      val ref = cPairs(rawContainment(d, num, den))
      for (st <- Seq(SetSimJoin.Strategy.Raw, SetSimJoin.Strategy.Prefix,
          SetSimJoin.Strategy.Auto)) {
        val got = cPairs(SetSimJoin.containmentJoin(
          d, "doc_id", "lang", "sh", "nsh", num, den, st))
        assert(ref == got, s"containment $st diverges at tau=$num/$den")
      }
      assert(ref.nonEmpty, s"fixture yields no pairs at tau=$num/$den — vacuous")
    }
  }

  test("containment Auto: raw on the hot-shingle-free documents corpus, " +
      "prefix under a planted hot shingle; strategies agree either way") {
    import spark.implicits._
    // real corpus: measured 0.3-2.5 raw rows/posting, far under the bound
    assert(SetSimJoin.choosePostingStrategy(
      shingles.filter(col("nsh") >= 5), "doc_id", "lang", "sh")
      == SetSimJoin.Strategy.Raw)
    // planted: 100 docs all share one boilerplate shingle → the raw join
    // emits 100·99 rows through it alone, 9 900 > 16·500 postings
    val hot = (0L until 100L).map(i =>
      (i, Seq("zz zz zz") ++ (1 to 4).map(j => s"u${i}_$j"))).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    assert(SetSimJoin.choosePostingStrategy(hot, "doc_id", "lang", "sh")
      == SetSimJoin.Strategy.Prefix)
    // and the hot fixture still returns identical (empty-of-false-positive)
    // results on every strategy — the switch is purely physical
    val ref = cPairs(rawContainment(hot, 8, 10))
    for (st <- Seq(SetSimJoin.Strategy.Raw, SetSimJoin.Strategy.Prefix,
        SetSimJoin.Strategy.Auto))
      assert(ref == cPairs(SetSimJoin.containmentJoin(
        hot, "doc_id", "lang", "sh", "nsh", 8, 10, st)), s"$st diverges")
  }

  test("containment: mutual inclusion emits both ordered directions; " +
      "hot shingle stays out of the prefix") {
    import spark.implicits._
    // 1 ⊂ 2 (all 5 of 1's shingles in 2; 2 has 10 → only (1,2) direction);
    // 3 and 4 are identical → mutual, BOTH (3,4) and (4,3);
    // every doc shares the hot boilerplate shingle "zz zz zz".
    val two = (1 to 9).map(i => s"w$i w${i + 1} w${i + 2}") :+ "zz zz zz"
    val one = two.take(4) :+ "zz zz zz"
    val three = Seq("p q r", "q r s", "r s t", "s t u", "zz zz zz")
    val df = Seq(
      (1L, one), (2L, two), (3L, three), (4L, three),
      (5L, Seq("a b c", "b c d", "c d e", "d e f", "zz zz zz"))
    ).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    for (st <- Seq(SetSimJoin.Strategy.Raw, SetSimJoin.Strategy.Prefix,
        SetSimJoin.Strategy.Auto)) {
      val got = cPairs(SetSimJoin.containmentJoin(
        df, "doc_id", "lang", "sh", "nsh", 8, 10, st))
      assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L), (4L, 3L)),
        s"strategy $st")
      assert(got == cPairs(rawContainment(df, 8, 10)), s"strategy $st")
    }
    // the hot shingle is shared by all 5 docs but must not appear in any
    // a-side prefix (prefix = 2 rarest of 5/10 at tau=0.8, df("zz zz zz")=5
    // is the max) — pin the prefix actually prunes it
    val posting = df.select(col("doc_id"), col("nsh"),
      explode(col("sh")).as("s"))
    val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = posting.join(freq, Seq("s"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("pos") <=
        col("nsh") - floor((col("nsh") * 8 + 9) / 10) + 1)
    assert(prefix.filter(col("s") === "zz zz zz").count() == 0)
  }

  test("containment at tau = 1 is exact subset inclusion (prefix length 1)") {
    import spark.implicits._
    // at tau = den/den the prefix lemma degenerates to length
    // n − ⌈n⌉ + 1 = 1: each doc posts ONLY its single rarest shingle,
    // and survivors must share EVERY shingle (n_shared = na)
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e", "d e f", "e f g")),     // ⊆ 2
      (2L, Seq("a b c", "b c d", "c d e", "d e f", "e f g", "x y z")),
      (3L, Seq("a b c", "b c d", "c d e", "d e f", "q q q"))      // 4/5 only
    ).toDF("doc_id", "sh")
      .withColumn("lang", lit("en")).withColumn("nsh", size(col("sh")))
    for (st <- Seq(SetSimJoin.Strategy.Raw, SetSimJoin.Strategy.Prefix,
        SetSimJoin.Strategy.Auto)) {
      val got = cPairs(SetSimJoin.containmentJoin(
        df, "doc_id", "lang", "sh", "nsh", 1, 1, st))
      assert(got == Set((1L, 2L, 5L, 5L)),
        s"tau=1 must admit exact subset inclusion only ($st): $got")
      assert(got == cPairs(rawContainment(df, 1, 1)), s"strategy $st")
    }
  }
}
