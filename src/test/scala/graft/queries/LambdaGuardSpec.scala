package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Loop-invariant-capture guard — the r8 lesson, promoted to a test.
  *
  * The O(n²) shape that bit twice in round 8 (q112 winnowing 204.8 s →
  * 1.85 s; one more in review): a higher-order function's lambda
  * captures an UNMATERIALIZED expression — Catalyst inlines the whole
  * subtree into the lambda body, so an expensive array-producing
  * expression that does not depend on the lambda variable is
  * re-evaluated once PER ELEMENT of the outer array. The fix is always
  * the same: materialize the captured stage as its own column first,
  * so the lambda captures an AttributeReference.
  *
  * The guard walks every registered query's ANALYZED plan: inside any
  * LambdaFunction body, an expensive node (another higher-order
  * function, a Sequence, a string split) whose subtree references NONE
  * of the lambda's variables is loop-invariant — recomputed per
  * element — and fails the suite. Foldable subtrees are exempt
  * (constant-folded once by the optimizer, e.g. a typedlit merge
  * table). A seeded regression of the exact q112 shape pins that the
  * walker actually catches it.
  */
class LambdaGuardSpec extends SparkTestBase {
  import spark.implicits._

  private def isExpensive(e: Expression): Boolean = e match {
    case _: HigherOrderFunction => true
    case _: Sequence => true
    case _: StringSplit => true
    case _ => false
  }

  /** All loop-invariant expensive captures in a plan, as report lines. */
  private def invariantCaptures(plan: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def scanLambda(owner: String, vars: Set[ExprId], body: Expression): Unit = {
      if (isExpensive(body) && !body.foldable &&
        !body.exists {
          case v: NamedLambdaVariable => vars(v.exprId)
          case _ => false
        })
        out += s"$owner: ${body.prettyName} recomputed per element " +
          s"(captures no lambda variable): ${body.simpleString(80)}"
      else body.children.foreach(scanLambda(owner, vars, _))
    }
    def walk(e: Expression): Unit = {
      e match {
        case h: HigherOrderFunction =>
          h.functions.foreach {
            case lf: LambdaFunction =>
              scanLambda(h.prettyName, lf.arguments.map(_.exprId).toSet, lf.function)
            case _ => ()
          }
        case _ => ()
      }
      e.children.foreach(walk)
    }
    plan.foreach(node => node.expressions.foreach(walk))
    out.toSeq
  }

  test("seeded q112 regression shape IS caught (and its materialized fix is clean)") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val toks = split(col("text"), " ")
    val hashed = transform(toks, t => md5(t))
    // the bug: the lambda captures the unmaterialized md5 array —
    // O(elements x array-build) at runtime
    val bad = df.select(transform(sequence(lit(0), size(toks) - 1),
      i => element_at(hashed, i + 1)).as("x"))
    val flags = invariantCaptures(bad.queryExecution.analyzed)
    assert(flags.nonEmpty, "the walker must flag the q112 capture shape")
    assert(flags.exists(_.contains("transform")), flags.mkString("; "))
    // the fix: materialize each stage as its own column — the lambda
    // then captures an attribute, which is free per element
    val good = df.withColumn("hashed", hashed)
      .select(transform(sequence(lit(0), size(col("hashed")) - 1),
        i => element_at(col("hashed"), i + 1)).as("x"))
    assert(invariantCaptures(good.queryExecution.analyzed).isEmpty,
      "attribute capture must not flag")
    // plan-embedded literal tables (the BPE merge table shape) are
    // foldable and exempt
    val lits = typedlit(Seq(Seq("a", "b"), Seq("c", "d")))
    val withLit = df.select(transform(toks,
      t => concat(t, element_at(element_at(lits, 1), 1))).as("x"))
    assert(invariantCaptures(withLit.queryExecution.analyzed).isEmpty,
      "foldable captures must not flag")
  }

  test("no registered query captures a loop-invariant expensive expression in a lambda") {
    val dir = sf("sf0.001")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df: DataFrame = fn(spark, dir)
        invariantCaptures(df.queryExecution.analyzed).map(f => s"$name -> $f")
    }
    assert(offenders.isEmpty,
      s"loop-invariant lambda captures found:\n${offenders.mkString("\n")}")
  }
}
