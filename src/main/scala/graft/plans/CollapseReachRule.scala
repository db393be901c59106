package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MultiReachExpression, ReachExpression}

/** Optimizer rule (SURVEY §4, optional work item): a `Project` that
  * reaches into the SAME JSON column with k distinct constant paths
  * parses that JSON k times. This rule rewrites every such
  * `ReachExpression(col, lit(path_i))` into
  * `GetStructField(MultiReachExpression(col, allPaths), i)` with ONE
  * shared MultiReach subtree per JSON column — Spark's subexpression
  * elimination then evaluates the parse once per row.
  *
  * Registered via GraftExtensions (injectOptimizerRule). Safe by
  * construction: only fires on constant paths inside one Project, and
  * produces byte-identical values (same walk, same rendering).
  */
object CollapseReachRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p: Project =>
      // Collect (jsonExpr → distinct constant paths) across project list.
      val groups = scala.collection.mutable.LinkedHashMap[Expression, Vector[String]]()
      p.projectList.foreach(_.foreach {
        case ReachExpression(json, Literal(path: UTF8String, _)) =>
          val key = json.canonicalized
          val paths = groups.getOrElse(key, Vector.empty)
          if (!paths.contains(path.toString))
            groups(key) = paths :+ path.toString
        case _ =>
      })
      val fusable = groups.filter(_._2.length >= 2)
      if (fusable.isEmpty) p
      else {
        // One canonical MultiReach per JSON column; identical subtrees
        // let subexpression elimination share the parse.
        val newList = p.projectList.map { ne =>
          ne.transform {
            case r @ ReachExpression(json, Literal(path: UTF8String, _))
                if fusable.contains(json.canonicalized) =>
              val paths = fusable(json.canonicalized)
              GetStructField(MultiReachExpression(json, paths),
                paths.indexOf(path.toString))
          }.asInstanceOf[NamedExpression]
        }
        p.copy(projectList = newList)
      }
  }
}
