package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The declared query inventory — every operator surface from SURVEY.md §2
  * that has a runnable query form, each with its DuckDB oracle when the op
  * is exactly SQL-expressible (approximate ops get rows-only checks).
  */
object QueryRegistry {
  def all: Seq[Q] =
    Relational.all ++ Relational2.all ++ TextAnalysis.all ++ Corpus.all ++
      CorpusOps.all ++
      Sharding.all ++ Dedup.all ++ VectorSearch.all ++ VectorCompress.all ++
      SparseSearch.all ++ HybridSearch.all ++ Molecules.all ++
      Ann.all ++ Pipelines.all ++ StreamingQ.all ++ SourcesQ.all ++
      Recursion.all ++ Fuzz.all ++ FuzzStream.all ++ FuzzDedup.all ++
      FuzzRecursion.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
