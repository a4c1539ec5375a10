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

  private def trigramFp(smiles: org.apache.spark.sql.Column) =
    array_sort(array_distinct(transform(
      sequence(lit(1), length(smiles) - 2),
      i => h32(smiles.substr(i, lit(3))) % 64)))

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

  val all: Seq[Q] = Seq(q_mol_similarity)
}
