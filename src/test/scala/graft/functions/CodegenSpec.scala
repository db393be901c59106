package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the codegen property of the native-expression family: the hot
  * kernels must live INSIDE a whole-stage codegen span (a
  * CodegenFallback expression severs the span and drops the projection
  * into interpreted evaluation — a silent 2-5× regression if it ever
  * comes back). Frames build on `spark.range`: a local relation would
  * be constant-folded by ConvertToLocalRelation before any codegen.
  */
class CodegenSpec extends SparkTestBase {
  import spark.implicits._

  private def inWholeStageSpan(df: org.apache.spark.sql.DataFrame,
                               marker: String): Boolean =
    df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains(marker) => w
    }.nonEmpty

  private def textFrame = spark.range(4)
    .select($"id", concat(lit("alpha beta gamma delta w"), $"id".cast("string")).as("text"))

  test("string kernels run inside whole-stage codegen spans") {
    assert(inWholeStageSpan(
      textFrame.select(call_function("graft_tokens", $"text")), "graft_tokens"))
    assert(inWholeStageSpan(
      textFrame.select(call_function("graft_shingles", $"text", lit(3))), "graft_shingles"))
    assert(inWholeStageSpan(
      textFrame.select(call_function("graft_simhash", $"text")), "graft_simhash"))
    assert(inWholeStageSpan(
      textFrame.select(call_function("graft_minhash", $"text", lit(4), lit(2))), "graft_minhash"))
  }

  test("similarity kernels run inside whole-stage codegen spans") {
    val vecs = spark.range(4).select($"id",
      array($"id".cast("float"), lit(1f)).as("a"),
      array(lit(0.5f), $"id".cast("float")).as("b"))
    assert(inWholeStageSpan(
      vecs.select(call_function("graft_float_dot", $"a", $"b")), "graft_float_dot"))
    assert(inWholeStageSpan(
      vecs.select(call_function("graft_srp_bucket", $"a", lit(4), lit(0))), "graft_srp_bucket"))
    val codes = spark.range(4).select($"id",
      array($"id".cast("byte"), lit(2).cast("byte")).as("a"),
      array(lit(3).cast("byte"), $"id".cast("byte")).as("b"))
    assert(inWholeStageSpan(
      codes.select(call_function("graft_int8_dot", $"a", $"b")), "graft_int8_dot"))
  }

  test("reach runs inside a whole-stage span and null-propagates a missing path") {
    val js = spark.range(2).select($"id",
      when($"id" === 0, lit("""{"a":1}""")).otherwise(lit("""{"b":2}""")).as("json"))
    val reached = js.select($"id", call_function("graft_reach", $"json", lit("$.a")).as("v"))
    assert(inWholeStageSpan(reached, "graft_reach"))
    val rows = reached.orderBy("id").collect()
    assert(rows(0).getString(1) === "1")
    assert(rows(1).isNullAt(1), "missing path must be NULL through the generated path")
  }
}
