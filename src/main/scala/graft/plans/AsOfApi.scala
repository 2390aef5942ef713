package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy mapping the logical AsOfJoin onto its exec node
  * (registered via `spark.experimental.extraStrategies`, or through
  * [[graft.functions.GraftExtensions]]-style injection at session
  * build). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tb, tol) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule for the custom node (SURVEY.md §7.2 M4): Catalyst's
  * own PushDownPredicates cannot see through a foreign operator, so a
  * `Filter` above an AsOfJoin would otherwise run AFTER the join —
  * shuffling and merge-scanning rows the filter immediately discards.
  * Deterministic predicates that reference only left-side columns are
  * semantically free to move below the join (each left row's match
  * depends only on that row), so push them down; right-side or mixed
  * predicates stay put (dropping right rows could change which row is
  * "latest as of"). Registered via
  * `spark.experimental.extraOptimizations`. */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoin) =>
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** User-facing API: `AsOf.join(events, orders, ...)`. */
object AsOf {

  /** `toleranceMicros`: pandas merge_asof(tolerance=...) semantics —
    * a match older than `leftTime - tolerance` yields NULLs instead.
    * Only timestamp / timestamp_ntz / long time columns are accepted
    * with a tolerance (the bound subtracts internal micros). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightTieBreak: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOf)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOf
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    toleranceMicros.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      Seq(attr(lPlan, leftTime), attr(rPlan, rightTime)).foreach { a =>
        require(Seq(TimestampType, TimestampNTZType, LongType)
          .contains(a.dataType),
          s"tolerance needs a timestamp/long time column; " +
            s"${a.name} is ${a.dataType}")
      }
    }
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime),
      attr(rPlan, rightTieBreak), toleranceMicros)
    org.apache.spark.sql.classic.GraftDatasetBridge.ofRows(spark, node)
  }
}
