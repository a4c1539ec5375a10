package graft.queries

import graft.functions.TextF.h32
import org.apache.spark.sql.functions._

/** Molecule fingerprint + Jaccard similarity — the drug-discovery shape
  * (reference examples/drug_discovery.md:26-51): SMILES → binary
  * substructure fingerprint → pairwise Jaccard ranking.
  *
  * The fingerprint is a deterministic stand-in for RDKit's topological
  * fingerprint (radient/tasks/vectorizers/molecule/rdkit.py:24-35,
  * presence-of-substructure bits): hashed character-3-gram presence bits
  * in a 64-bucket space. Input is inline (both in Spark and in the oracle
  * VALUES clause) because the driver tables carry no SMILES column.
  */
object Molecules {

  /** Common public drug molecules (name → SMILES). */
  val molecules: Seq[(String, String)] = Seq(
    "aspirin" -> "CC(=O)OC1=CC=CC=C1C(=O)O",
    "ibuprofen" -> "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "naproxen" -> "CC(C1=CC2=C(C=C1)C=C(C=C2)OC)C(=O)O",
    "ketoprofen" -> "CC(C1=CC(=CC=C1)C(=O)C2=CC=CC=C2)C(=O)O",
    "paracetamol" -> "CC(=O)NC1=CC=C(C=C1)O",
    "caffeine" -> "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
    "theobromine" -> "CN1C=NC2=C1C(=O)NC(=O)N2C",
    "nicotine" -> "CN1CCCC1C2=CN=CC=C2",
    "benzene" -> "C1=CC=CC=C1",
    "toluene" -> "CC1=CC=CC=C1",
    "phenol" -> "C1=CC=C(C=C1)O",
    "salicylic_acid" -> "C1=CC=C(C(=C1)C(=O)O)O")

  /** Hashed character w-gram bucket list, guarded like TextF.shingles: a
    * SMILES shorter than the window yields an EMPTY list. Unguarded,
    * Spark's sequence(1, 0) is DESCENDING [1, 0] (and sequence(1, -1) walks
    * negative substr positions), producing spurious buckets where DuckDB's
    * range(1, n+1) is empty. */
  private def gramBuckets(smiles: org.apache.spark.sql.Column, w: Int, buckets: Int) =
    when(length(smiles) >= w,
      transform(sequence(lit(1), length(smiles) - (w - 1)),
        i => h32(smiles.substr(i, lit(w))) % buckets))
      .otherwise(array().cast("array<bigint>"))

  private def trigramFp(smiles: org.apache.spark.sql.Column) =
    array_sort(array_distinct(gramBuckets(smiles, 3, 64)))

  val q_mol_similarity = Q(
    "q_mol_similarity",
    (s, dir) => {
      import s.implicits._
      val m = molecules.toDF("name", "smiles")
        .select(col("name"), trigramFp(col("smiles")).as("fp"))
        .withColumn("nfp", size(col("fp")))
      val a = m.select(col("name").as("name_a"), col("fp").as("fp_a"), col("nfp").as("na"))
      val b = m.select(col("name").as("name_b"), col("fp").as("fp_b"), col("nfp").as("nb"))
      val inter = size(array_intersect(col("fp_a"), col("fp_b"))).cast("double")
      a.crossJoin(b)
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          (inter / (col("na") + col("nb") - inter)).as("jaccard"))
        .orderBy(desc("jaccard"), col("name_a"), col("name_b"))
        .limit(10)
    },
    Some {
      val values = molecules.map { case (n, s) => s"('$n', '$s')" }.mkString(",\n  ")
      val fp = s"list_sort(list_distinct(list_transform(range(1, length(smiles) - 1), " +
        s"i -> ${Sql.h32("substr(smiles, i, 3)")} % 64)))"
      val interSql = "len(list_filter(a.fp, x -> list_contains(b.fp, x)))::DOUBLE"
      s"""
      |WITH m AS (
      |  SELECT name, $fp AS fp
      |  FROM (VALUES $values) AS mols(name, smiles))
      |SELECT a.name AS name_a, b.name AS name_b,
      |  $interSql / (len(a.fp) + len(b.fp) - $interSql) AS jaccard
      |FROM m a JOIN m b ON a.name < b.name
      |ORDER BY jaccard DESC, name_a, name_b
      |LIMIT 10
      |""".stripMargin
    })

  /** Morgan-style fingerprint: growing "circular environment" windows
    * (radius 0/1/2 character contexts as the offline stand-in for atom
    * environments — reference rdkit.py:24-27's `fingerprint_type="morgan"`
    * branch), hashed into the same 64-bucket presence space. */
  private def morganFp(smiles: org.apache.spark.sql.Column) =
    array_sort(array_distinct(flatten(array(
      gramBuckets(smiles, 1, 64),
      gramBuckets(smiles, 3, 64),
      gramBuckets(smiles, 5, 64)))))

  private val morganFpSql = {
    def ctx(w: Int, lenExpr: String) =
      s"list_transform(range(1, $lenExpr + 1), i -> ${Sql.h32(s"substr(smiles, i, $w)")} % 64)"
    "list_sort(list_distinct(flatten([" +
      ctx(1, "length(smiles)") + ", " +
      ctx(3, "greatest(length(smiles) - 2, 0)") + ", " +
      ctx(5, "greatest(length(smiles) - 4, 0)") + "])))"
  }

  val q_mol_morgan = Q(
    "q_mol_morgan",
    (s, dir) => {
      import s.implicits._
      val m = molecules.toDF("name", "smiles")
        .select(col("name"), morganFp(col("smiles")).as("fp"))
        .withColumn("nfp", size(col("fp")))
      val a = m.select(col("name").as("name_a"), col("fp").as("fp_a"), col("nfp").as("na"))
      val b = m.select(col("name").as("name_b"), col("fp").as("fp_b"), col("nfp").as("nb"))
      val inter = size(array_intersect(col("fp_a"), col("fp_b"))).cast("double")
      a.crossJoin(b)
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          round(inter / (col("na") + col("nb") - inter), 6).as("jaccard"))
        .orderBy(desc("jaccard"), col("name_a"), col("name_b"))
        .limit(10)
    },
    Some {
      val values = molecules.map { case (n, s) => s"('$n', '$s')" }.mkString(",\n  ")
      val interSql = "len(list_filter(a.fp, x -> list_contains(b.fp, x)))::DOUBLE"
      s"""
      |WITH m AS (
      |  SELECT name, $morganFpSql AS fp
      |  FROM (VALUES $values) AS mols(name, smiles))
      |SELECT a.name AS name_a, b.name AS name_b,
      |  round($interSql / (len(a.fp) + len(b.fp) - $interSql), 6) AS jaccard
      |FROM m a JOIN m b ON a.name < b.name
      |ORDER BY jaccard DESC, name_a, name_b
      |LIMIT 10
      |""".stripMargin
    })

  /** The packed-bitmap scale path: the trigram fingerprint in a 62-bit
    * bucket space packed into ONE long, Jaccard via AND/OR popcount
    * (VectorF.jaccardSimPacked semantics — gann.c's bit kernels). 62 bits
    * because the oracle engine rejects a `1 << 63` overflow. */
  private def packedFp(smiles: org.apache.spark.sql.Column) =
    aggregate(
      array_distinct(gramBuckets(smiles, 3, 62)),
      lit(0L),
      // 2^b via double pow — exact for powers of two below 2^62
      (acc, b) => acc.bitwiseOR(pow(lit(2.0), b.cast("double")).cast("long")))

  val q_mol_packed = Q(
    "q_mol_packed",
    (s, dir) => {
      import s.implicits._
      val m = molecules.toDF("name", "smiles")
        .select(col("name"), packedFp(col("smiles")).as("fp"))
      val a = m.select(col("name").as("name_a"), col("fp").as("fp_a"))
      val b = m.select(col("name").as("name_b"), col("fp").as("fp_b"))
      val inter = bit_count(col("fp_a").bitwiseAND(col("fp_b"))).cast("double")
      val union = bit_count(col("fp_a").bitwiseOR(col("fp_b"))).cast("double")
      a.crossJoin(b)
        .filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          round(inter / union, 6).as("jaccard"))
        .orderBy(desc("jaccard"), col("name_a"), col("name_b"))
        .limit(10)
    },
    Some {
      val values = molecules.map { case (n, s) => s"('$n', '$s')" }.mkString(",\n  ")
      val fpArr = s"list_distinct(list_transform(range(1, length(smiles) - 1), " +
        s"i -> ${Sql.h32("substr(smiles, i, 3)")} % 62))"
      s"""
      |WITH m AS (
      |  SELECT name,
      |    list_sum(list_transform($fpArr, b -> (1::BIGINT << b::INT)))::BIGINT AS fp
      |  FROM (VALUES $values) AS mols(name, smiles))
      |SELECT a.name AS name_a, b.name AS name_b,
      |  round(bit_count(a.fp & b.fp)::DOUBLE / bit_count(a.fp | b.fp)::DOUBLE, 6) AS jaccard
      |FROM m a JOIN m b ON a.name < b.name
      |ORDER BY jaccard DESC, name_a, name_b
      |LIMIT 10
      |""".stripMargin
    })

  val all: Seq[Q] = Seq(q_mol_similarity, q_mol_morgan, q_mol_packed)
}
