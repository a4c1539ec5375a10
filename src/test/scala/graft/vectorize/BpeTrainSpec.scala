package graft.vectorize

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The distributed BPE trainer must agree with an independent
  * sequential implementation written here from the algorithm
  * definition — two codebases, one answer. */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Naive reference BPE: corpus → weighted char-symbol vocab, then
    * repeatedly merge the globally most frequent adjacent pair
    * (ties lexicographic on "a b"). */
  private def naiveBpe(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val vocab = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var state: Map[Seq[String], Long] =
      vocab.map { case (w, n) => (w.map(_.toString): Seq[String]) -> n }
    var merges = Vector.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + n
        }
      }
      if (counts.isEmpty) return merges
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
      merges = merges :+ best
      state = state.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += best._1 + best._2; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toSeq: Seq[String]) -> n
      }
      round += 1
    }
    merges
  }

  private val words = Seq(
    "hug", "hug", "hug", "hug", "hug", "hug", "hug", "hug", "hug", "hug",
    "pug", "pug", "pug", "pug", "pug",
    "pun", "pun", "pun", "pun", "pun", "pun", "pun", "pun", "pun", "pun", "pun", "pun",
    "bun", "bun", "bun", "bun",
    "hugs", "hugs", "hugs", "hugs", "hugs")

  test("distributed trainer matches the sequential reference") {
    import spark.implicits._
    val df = words.toDF("text") // one word per row → tokens() passes through
    val v = BpeTrain.vocab(df, "text")
    val got = BpeTrain.learn(v, numMerges = 6)
    val want = naiveBpe(words, numMerges = 6)
    info(s"merges: ${got.mkString(" ")}")
    assert(got == want)
  }

  test("encode applies merges in learned order") {
    val merges = Seq(("h", "u"), ("hu", "g"))
    assert(BpeTrain.applyMerges("hug", merges) == Seq("hug"))
    assert(BpeTrain.applyMerges("hugs", merges) == Seq("hug", "s"))
    assert(BpeTrain.applyMerges("bug", merges) == Seq("b", "u", "g"))
    assert(BpeTrain.applyMerges("", merges) == Seq.empty)
  }

  test("training exhausts when the vocabulary is fully merged") {
    import spark.implicits._
    val df = Seq("ab", "ab").toDF("text")
    val got = BpeTrain.learn(BpeTrain.vocab(df, "text"), numMerges = 10)
    assert(got == Seq(("a", "b"))) // one possible merge, then stop
  }

  test("learned merges on the documents corpus segment consistently") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val v = BpeTrain.vocab(docs, "text")
    val merges = BpeTrain.learn(v, numMerges = 8)
    assert(merges.length == 8)
    assert(merges.distinct.length == 8) // a pair is consumed once merged
    val pieces = BpeTrain.encode(docs, "doc_id", "text", merges)
    // segmentation is a partition of each word's characters: total chars conserved
    import org.apache.spark.sql.functions._
    val charsIn = docs
      .select(explode(graft.functions.TextF.tokens(col("text"))).as("w"))
      .select(sum(length(col("w")))).collect()(0).getLong(0)
    val charsOut = pieces.select(sum(length(col("piece")))).collect()(0).getLong(0)
    assert(charsIn == charsOut)
  }
}
