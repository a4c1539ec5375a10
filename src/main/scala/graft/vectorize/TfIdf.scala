package graft.vectorize

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.linalg.SparseVector

/** MLlib-native sparse text vectorizer: tokenize → HashingTF → IDF →
  * L2 Normalizer. This is the one reference vectorizer family Spark
  * covers 1:1 with built-ins (radient/tasks/vectorizers/text/sklearn.py
  * intended CountVectorizer semantics — and fixes its unfitted-model bug
  * by actually fitting the IDF stage). Output is a true SparseVector
  * column (the reference's planned-but-unshipped sparse vector type,
  * sklearn.py:27-28).
  */
object TfIdf {

  def pipeline(textCol: String = "text", dim: Int = 1 << 12): Pipeline = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("_toks")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF().setInputCol("_toks").setOutputCol("_tf")
      .setNumFeatures(dim)
    val idf = new IDF().setInputCol("_tf").setOutputCol("_tfidf")
    val norm = new Normalizer().setInputCol("_tfidf").setOutputCol("tfidf")
      .setP(2.0)
    new Pipeline().setStages(Array(tok, tf, idf, norm))
  }

  def fit(docs: DataFrame, textCol: String = "text", dim: Int = 1 << 12): PipelineModel =
    pipeline(textCol, dim).fit(docs)

  def embed(model: PipelineModel, docs: DataFrame): DataFrame =
    model.transform(docs).drop("_toks", "_tf", "_tfidf")

  /** Sparse dot product — on L2-normalized tf-idf this is cosine. */
  val sparseDot: (SparseVector, SparseVector) => Double = (a, b) => {
    var i = 0; var j = 0; var s = 0.0
    val ai = a.indices; val av = a.values
    val bi = b.indices; val bv = b.values
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { s += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    s
  }

  /** Top-k documents for a query string by tf-idf cosine — the
    * drug-discovery/RAG search shape on the sparse path. */
  def topK(model: PipelineModel, corpus: DataFrame, textCol: String,
      query: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qv = embed(model, Seq(query).toDF(textCol))
      .select("tfidf").head().getAs[SparseVector](0)
    val bc = spark.sparkContext.broadcast(qv)
    val dotUdf = udf((v: SparseVector) => sparseDot(v, bc.value))
    embed(model, corpus)
      .withColumn("score", dotUdf(col("tfidf")))
      .drop("tfidf")
      .orderBy(desc("score"), col(corpus.columns.head))
      .limit(k)
  }
}
