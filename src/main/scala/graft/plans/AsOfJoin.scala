package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join — the full custom-operator stack (SURVEY §7.5 tier c):
  * marker expression → logical node → optimizer rewrite → planner strategy
  * → physical operator, wired through PUBLIC hooks
  * (`functionRegistry` + `spark.experimental.extraOptimizations` /
  * `extraStrategies`; the SparkSessionExtensions form of the same
  * registration is in [[GraftAsOfExtensions]]).
  *
  * Semantics: for each left row, the single right row with the greatest
  * `rightTime <= leftTime` among rows sharing the equality key — ties on
  * time broken by the LAST row in (time, input-order) sort. Unmatched left
  * rows keep null right columns (left-outer as-of).
  *
  * Physical strategy: the right side is collected, grouped per key, and
  * time-sorted ONCE, then broadcast; each left partition does an O(log n)
  * binary search per row. Compared to the compositional
  * join+window-top-1 plan this never materializes the per-key fan-out
  * (|events| × |orders-per-user| intermediate rows). Build-side-must-fit
  * is the standard broadcast-join contract.
  */
object AsOfJoin {

  /** Boolean marker that carries the as-of spec through analysis inside an
    * ordinary join condition; rewritten before planning, never evaluated.
    */
  case class AsOfMarker(leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression)
      extends Expression with Unevaluable {
    override def children: Seq[Expression] =
      Seq(leftKey, rightKey, leftTime, rightTime)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "asof_marker"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
  }

  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Join(condition = asof_marker(...)) → AsOfJoinPlan. */
  object RewriteAsOfJoin extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case Join(l, r, _, Some(m: AsOfMarker), _) =>
        AsOfJoinPlan(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime)
    }
  }

  object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val rightRows = right.executeCollect() // copied rows
      val boundRk = BindReferences.bindReference(rightKey, right.output)
      val boundRt = BindReferences.bindReference(rightTime, right.output)
      // per key: rows sorted ascending by (time, collect order); stable
      // sortBy keeps input order among equal times
      val buildMap: Map[Any, (Array[Long], Array[InternalRow])] =
        rightRows.toSeq
          .map(r => (boundRk.eval(r), toMicros(boundRt.eval(r)), r))
          .filter(t => t._1 != null && t._2 != Long.MinValue)
          .groupBy(_._1)
          .map { case (k, rows) =>
            val sorted = rows.sortBy(_._2)
            (k, (sorted.map(_._2).toArray, sorted.map(_._3).toArray[InternalRow]))
          }
      val bc = sparkContext.broadcast(buildMap)
      val rightWidth = right.output.size
      val leftOut = left.output
      val lk = leftKey
      val lt = leftTime
      val allOut = output

      left.execute().mapPartitions { iter =>
        val map = bc.value
        val boundLk = BindReferences.bindReference(lk, leftOut)
        val boundLt = BindReferences.bindReference(lt, leftOut)
        val nullRight = new GenericInternalRow(rightWidth)
        val joined = new JoinedRow
        val project = UnsafeProjection.create(allOut, allOut)
        iter.map { lrow =>
          val key = boundLk.eval(lrow)
          val t = toMicros(boundLt.eval(lrow))
          val matched: InternalRow =
            if (key == null || t == Long.MinValue) nullRight
            else map.get(key) match {
              case Some((times, rows)) =>
                val idx = lastLeq(times, t)
                if (idx >= 0) rows(idx) else nullRight
              case None => nullRight
            }
          project(joined(lrow, matched))
        }
      }
    }

    /** timestamps evaluate to java Long micros; accept numeric longs too. */
    private def toMicros(v: Any): Long = v match {
      case null       => Long.MinValue
      case l: Long    => l
      case i: Int     => i.toLong
      case _          => Long.MinValue
    }

    /** greatest index with times(i) <= t, or -1. */
    private def lastLeq(times: Array[Long], t: Long): Int = {
      var lo = 0
      var hi = times.length - 1
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      ans
    }
  }

  /** Idempotent registration on an EXISTING session via the public
    * experimental hooks (the builder-time equivalent is
    * [[GraftAsOfExtensions]]).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "asof_marker",
      exprs => AsOfMarker(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    if (!spark.experimental.extraOptimizations.contains(RewriteAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAsOfJoin
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** left-outer as-of join: latest `right` row per key at or before the
    * left row's time.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    left.join(right,
      call_function("asof_marker",
        left(leftKey), right(rightKey), left(leftTime), right(rightTime)),
      "left")
  }
}

/** Builder-time registration: `SparkSession.builder.withExtensions(new
  * GraftAsOfExtensions)` — same rule + strategy via the official
  * SparkSessionExtensions seam.
  */
class GraftAsOfExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => AsOfJoin.RewriteAsOfJoin)
    e.injectPlannerStrategy(_ => AsOfJoin.AsOfJoinStrategy)
  }
}
