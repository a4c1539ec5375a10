package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WorkflowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("linear chain with implicit deps mirrors reference default") {
    import spark.implicits._
    val wf = new Workflow()
      .source("docs", Seq((1L, "a b c"), (2L, "d e")).toDF("id", "text"))
      .map("tokens", _.select(col("id"), explode(split(col("text"), " ")).as("tok")))
      .map("counts", _.groupBy("id").count())
    val out = wf.execute().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L))
    assert(wf.stageNames == Seq("docs", "tokens", "counts"))
  }

  test("multi-dependency stage joins two inputs") {
    import spark.implicits._
    val wf = new Workflow()
      .source("left", Seq((1L, "x")).toDF("id", "a"))
      .source("right", Seq((1L, "y")).toDF("id", "b"))
      .add("joined", ins => ins(0).join(ins(1), "id"), Seq("left", "right"))
    assert(wf.execute().columns.toSeq == Seq("id", "a", "b"))
    assert(wf.execute().count() == 1)
  }

  test("empty-input propagation (the reference's None short-circuit)") {
    import spark.implicits._
    val wf = new Workflow()
      .source("src", Seq.empty[(Long, String)].toDF("id", "text"))
      .map("downstream", _.filter(col("id") > 0).groupBy("text").count())
    assert(wf.execute().count() == 0)
  }

  test("extra_vars reach the stage at execute time (workflow.py:74-75)") {
    import spark.implicits._
    val wf = new Workflow()
      .source("docs", Seq((1L, 5.0), (2L, 11.0), (3L, 20.0)).toDF("id", "v"))
      .addWithParams("filtered", (ins, params) =>
        ins.head.filter(col("v") >= params.getOrElse("min_v", "0").toDouble))
    assert(wf.execute().count() == 3) // default params
    val strict = wf.execute(Map("filtered" -> Map("min_v" -> "10")))
    assert(strict.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("flattened() cycles shorter inputs to the longest (flatten_inputs.py:32-50)") {
    import spark.implicits._
    val letters = Seq("x", "y", "z").toDF("letter")          // len 3
    val nums = Seq(1L, 2L).toDF("num")                       // len 2 → cycles
    val one = Seq("only").toDF("tag")                        // len 1 → broadcast
    val z = Workflow.flattened(Seq(letters, nums, one))
      .orderBy("zip_idx")
      .select("zip_idx", "letter", "num", "tag")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(z.toSeq == Seq(
      (0L, "x", 1L, "only"),
      (1L, "y", 2L, "only"),
      (2L, "z", 1L, "only")))   // num cycled: idx 2 % 2 = 0 → back to 1
  }

  test("flattened() suffixes colliding column names by input index") {
    import spark.implicits._
    val a = Seq(("a1", 1L), ("a2", 2L)).toDF("v", "id")
    val b = Seq("b1").toDF("v")
    val z = Workflow.flattened(Seq(a, b))
    assert(z.columns.toSeq == Seq("zip_idx", "v", "id", "v_1"))
    assert(z.filter(col("v_1") === "b1").count() == 2)
  }

  test("zipped() stage consumes the aligned frame inside a Workflow") {
    import spark.implicits._
    val wf = new Workflow()
      .source("docs", Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma")).toDF("id", "text"))
      .source("prefixes", Seq("p0", "p1").toDF("prefix"))
      .addWithParams("tagged", Workflow.zipped((aligned, _) =>
        aligned.select(col("id"), concat_ws(":", col("prefix"), col("text")).as("tagged"))),
        Seq("docs", "prefixes"))
    val out = wf.execute().orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("p0:alpha", "p1:beta", "p0:gamma"))
  }

  test("duplicate and unknown stage names are rejected") {
    import spark.implicits._
    val base = new Workflow().source("a", Seq(1).toDF("x"))
    intercept[IllegalArgumentException](base.source("a", Seq(1).toDF("x")))
    intercept[IllegalArgumentException](base.map("b", identity, dependency = "nope"))
  }
}
