package graft.pipeline

import org.apache.spark.sql.DataFrame

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
}
