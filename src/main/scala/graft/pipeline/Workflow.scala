package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Workflow-parity fluent DAG builder (reference
  * radient/orchestrate/workflow.py:24-83): named stages, explicit or
  * implicit linear dependencies, topological execution, last-node result.
  *
  * Composing DataFrames IS the DAG — `execute` only wires lazy
  * DataFrame transformations together and returns the final frame;
  * nothing runs until an action. The reference's `[None]` short-circuit
  * (workflow.py:66-69) maps to empty-DataFrame propagation, which Spark
  * handles natively (empty relations flow through joins/unions), and its
  * fan-out list outputs (workflow.py:71-80) are just multi-row frames.
  */
final class Workflow private (
    stages: Vector[(String, Seq[String], Workflow.StageFn)]) {

  def this() = this(Vector.empty)

  /** Add a stage; default dependency = previous stage (the reference's
    * linear-chain default, workflow.py:30-33). */
  def add(name: String, fn: Seq[DataFrame] => DataFrame,
      dependencies: Seq[String] = null): Workflow =
    addWithParams(name, (ins, _) => fn(ins), dependencies)

  /** Add a parameterized stage: `fn` also receives this stage's
    * `extra_vars` map resolved at execute time (workflow.py:74-75 — the
    * reference merges per-node extra_vars over the call kwargs). */
  def addWithParams(name: String, fn: Workflow.StageFn,
      dependencies: Seq[String] = null): Workflow = {
    require(!stages.exists(_._1 == name), s"duplicate stage '$name'")
    val deps = Option(dependencies).getOrElse(
      stages.lastOption.map(s => Seq(s._1)).getOrElse(Nil))
    deps.foreach(d => require(stages.exists(_._1 == d), s"unknown dependency '$d'"))
    new Workflow(stages :+ ((name, deps, fn)))
  }

  /** Convenience: source stage with no inputs. */
  def source(name: String, df: => DataFrame): Workflow =
    add(name, _ => df, dependencies = Nil)

  /** Single-input transform stage. */
  def map(name: String, fn: DataFrame => DataFrame,
      dependency: String = null): Workflow =
    add(name, ins => fn(ins.head),
      Option(dependency).map(Seq(_)).orNull)

  /** Compile + execute in topological order (toposort is trivial here:
    * `add` already rejects forward references, so insertion order is a
    * valid topological order — same invariant graphlib enforces in the
    * reference, workflow.py:41-43). Returns every stage's frame.
    * `extraVars` carries per-stage runtime parameter maps
    * (workflow.py:45-83's `execute(extra_vars)`). */
  def executeAll(extraVars: Map[String, Map[String, String]] = Map.empty)
      : Map[String, DataFrame] = {
    var outputs = Map.empty[String, DataFrame]
    stages.foreach { case (name, deps, fn) =>
      outputs += name -> fn(deps.map(outputs), extraVars.getOrElse(name, Map.empty))
    }
    outputs
  }

  /** Execute and return the last stage's frame (workflow.py:83 parity). */
  def execute(extraVars: Map[String, Map[String, String]] = Map.empty): DataFrame = {
    require(stages.nonEmpty, "empty workflow")
    executeAll(extraVars)(stages.last._1)
  }

  def stageNames: Seq[String] = stages.map(_._1)
}

object Workflow {
  /** (dependency frames, resolved extra_vars for this stage) → frame. */
  type StageFn = (Seq[DataFrame], Map[String, String]) => DataFrame

  /** `flattened()` parity (radient/utils/flatten_inputs.py:32-50): align
    * multiple fan-in frames row-positionally, CYCLING shorter inputs to
    * the longest one — input i contributes its row at `zip_idx mod len_i`
    * — and return one frame of `zip_idx` + every input's columns (later
    * duplicates suffixed `_<input index>`). The reference zips python
    * lists this way before calling a multi-input task.
    *
    * Row position is the input's current row order (RDD `zipWithIndex`,
    * which preserves partition order — the DataFrame twin of list order).
    * The lengths are driver-side `count()`s, mirroring the reference's
    * `len()`; each cycle alignment is then a plain equi-join on the
    * modulo key, so short inputs broadcast and nothing is collected. */
  def flattened(inputs: Seq[DataFrame]): DataFrame = {
    require(inputs.nonEmpty, "flattened() needs at least one input")
    val spark = inputs.head.sparkSession
    // the per-input len() counts are independent jobs — run them
    // concurrently so the alignment prologue costs one job latency, not
    // one per input (the GannIndex concurrent-tree pattern)
    val counts = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(
        Future.sequence(inputs.map(df => Future(df.count()))), Duration.Inf)
    }
    require(counts.forall(_ > 0), "flattened() inputs must be non-empty")
    val maxLen = counts.max
    val seen = scala.collection.mutable.Set.empty[String]
    val indexed = inputs.zipWithIndex.map { case (df, i) =>
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (seen.add(c)) d else d.withColumnRenamed(c, s"${c}_$i")
      }
      val schema = renamed.schema.add("_pos", org.apache.spark.sql.types.LongType)
      val rdd = renamed.rdd.zipWithIndex().map { case (r, idx) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ idx)
      }
      spark.createDataFrame(rdd, schema)
    }
    val base = spark.range(maxLen).select(col("id").as("zip_idx"))
    indexed.zip(counts).foldLeft(base) { case (acc, (df, n)) =>
      acc.withColumn("_k", col("zip_idx") % n)
        .join(broadcast(df), col("_k") === df("_pos"))
        .drop("_k", "_pos")
    }
  }

  /** Multi-dep stage whose inputs arrive pre-aligned through
    * [[flattened]] — the `Workflow.add(..., flatten_inputs=True)` shape. */
  def zipped(fn: (DataFrame, Map[String, String]) => DataFrame): StageFn =
    (ins, params) => fn(flattened(ins), params)
}
