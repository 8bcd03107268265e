package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.internal.SQLConf
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
  * time broken by the greatest `tieBreak` values (or, with no tieBreak,
  * the last row in (time, input-order) sort on the broadcast path).
  * Unmatched left rows keep null right columns (left-outer as-of).
  *
  * TWO physical strategies, chosen by `spark.graft.asof.strategy`:
  *  - `broadcast` ([[AsOfJoin.AsOfBroadcastExec]]): right side collected,
  *    grouped per key, time-sorted once, broadcast; each left partition
  *    binary-searches per row. Never materializes the per-key fan-out
  *    (|events| × |orders-per-user| rows) of the compositional plan.
  *    Build-side-must-fit is the standard broadcast-join contract.
  *  - `sortmerge` ([[AsOfJoin.AsOfSortMergeExec]]): BOTH sides hash-
  *    partitioned by key and sorted by (key, time[, tieBreak…]) —
  *    EnsureRequirements inserts the exchanges/sorts — then one streaming
  *    merge pass per co-partition. No build-side size limit: the 100 TB
  *    path when the right side is large.
  *  - `auto` (default): broadcast when the right side's plan statistics
  *    fit `spark.sql.autoBroadcastJoinThreshold`, else sortmerge — the
  *    same contract Spark's own join selection applies.
  */
object AsOfJoin {

  val StrategyConfKey = "spark.graft.asof.strategy"

  /** Boolean marker that carries the as-of spec through analysis inside an
    * ordinary join condition; rewritten before planning, never evaluated.
    * children = leftKey, rightKey, leftTime, rightTime, modeLiteral,
    * tieBreak… — the strategy mode rides IN the plan (not session conf) so
    * a built DataFrame keeps its requested exec regardless of when the
    * action runs or what other joins set afterwards.
    */
  case class AsOfMarker(children: Seq[Expression])
      extends Expression with Unevaluable {
    def leftKey: Expression = children(0)
    def rightKey: Expression = children(1)
    def leftTime: Expression = children(2)
    def rightTime: Expression = children(3)
    def mode: String = children(4) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
        v.toString
      case _ => "auto"
    }
    def tieBreak: Seq[Expression] = children.drop(5)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "asof_marker"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      tieBreak: Seq[Expression], mode: String = "auto") extends BinaryNode {
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
        AsOfJoinPlan(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime,
          m.tieBreak, m.mode)
    }
  }

  object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p @ AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, planMode) =>
        val conf = SQLConf.get
        // per-join mode wins; "auto" falls through to the session conf,
        // then to the broadcast-threshold statistics decision
        val mode =
          if (planMode != "auto") planMode
          else conf.getConfString(StrategyConfKey, "auto")
        val fits = r.stats.sizeInBytes >= 0 &&
          r.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold
        val exec =
          if (mode == "broadcast" || (mode == "auto" && fits))
            AsOfBroadcastExec(planLater(l), planLater(r), lk, rk, lt, rt, tb)
          else
            AsOfSortMergeExec(planLater(l), planLater(r), lk, rk, lt, rt, tb)
        exec :: Nil
      case _ => Nil
    }
  }

  /** timestamps evaluate to java Long micros; accept numeric longs too. */
  private[plans] def toMicros(v: Any): Long = v match {
    case null    => Long.MinValue
    case l: Long => l
    case i: Int  => i.toLong
    case _       => Long.MinValue
  }

  /** greatest index with times(i) <= t, or -1. */
  private[plans] def lastLeq(times: Array[Long], t: Long): Int = {
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

  case class AsOfBroadcastExec(left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      tieBreak: Seq[Expression]) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val rightRows = right.executeCollect() // copied rows
      val boundRk = BindReferences.bindReference(rightKey, right.output)
      val boundRt = BindReferences.bindReference(rightTime, right.output)
      val boundTb = tieBreak.map(BindReferences.bindReference(_, right.output))
      val tbOrds = boundTb.map(e => TypeUtils.getInterpretedOrdering(e.dataType))
      // per key: rows sorted ascending by (time, tieBreak…, collect order);
      // stable sort keeps input order among full ties
      val buildMap: Map[Any, (Array[Long], Array[InternalRow])] =
        rightRows.toSeq
          .map(r => (boundRk.eval(r), toMicros(boundRt.eval(r)), r,
            boundTb.map(_.eval(r))))
          .filter(t => t._1 != null && t._2 != Long.MinValue)
          .groupBy(_._1)
          .map { case (k, rows) =>
            val sorted = rows.sortWith { (a, b) =>
              if (a._2 != b._2) a._2 < b._2
              else {
                var i = 0
                var cmp = 0
                while (cmp == 0 && i < tbOrds.length) {
                  val av = a._4(i); val bv = b._4(i)
                  // nulls first, matching the sortmerge path's
                  // SortOrder(Ascending) default — so "last wins" means a
                  // null tieBreak loses to any non-null
                  cmp =
                    if (av == null && bv == null) 0
                    else if (av == null) -1
                    else if (bv == null) 1
                    else tbOrds(i).compare(av, bv)
                  i += 1
                }
                cmp < 0
              }
            }
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
  }

  /** Shuffle/sort as-of: both sides clustered by key and sorted by
    * (key, time[, tieBreak…]); one forward-only merge pass per
    * co-partition. Because left rows arrive time-ascending within a key,
    * the right cursor only ever advances — each right row is visited
    * once; `lastMatch` holds the best (greatest (time, tieBreak) ≤ t)
    * row seen for the current key. No build-side size limit.
    */
  case class AsOfSortMergeExec(left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      tieBreak: Seq[Expression]) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        tieBreak.map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val rightOut = right.output
      val lk = leftKey; val rk = rightKey
      val lt = leftTime; val rt = rightTime
      val allOut = output
      val rightWidth = rightOut.size
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val boundLk = BindReferences.bindReference(lk, leftOut)
        val boundLt = BindReferences.bindReference(lt, leftOut)
        val boundRk = BindReferences.bindReference(rk, rightOut)
        val boundRt = BindReferences.bindReference(rt, rightOut)
        val nullRight = new GenericInternalRow(rightWidth)
        val joined = new JoinedRow
        val project = UnsafeProjection.create(allOut, allOut)

        // right cursor (rows copied: shuffle iterators reuse row objects;
        // null-keyed / null-timed right rows can never match — skipped)
        var rRow: InternalRow = null
        var rKey: Any = null
        var rTime: Long = Long.MinValue
        def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val row = rIter.next()
            val k = boundRk.eval(row)
            val t = toMicros(boundRt.eval(row))
            if (k != null && t != Long.MinValue) {
              rRow = row.copy()
              rKey = InternalRow.copyValue(k)
              rTime = t
            }
          }
          if (rRow == null) { rKey = null; rTime = Long.MinValue }
        }
        advanceRight()

        var haveKey = false
        var curKey: Any = null
        var lastMatch: InternalRow = null

        lIter.map { lrow =>
          val k = boundLk.eval(lrow)
          val t = toMicros(boundLt.eval(lrow))
          val matched: InternalRow =
            if (k == null || t == Long.MinValue) nullRight
            else {
              if (!haveKey || keyOrd.compare(curKey, k) != 0) {
                curKey = InternalRow.copyValue(k)
                haveKey = true
                lastMatch = null
                while (rRow != null && keyOrd.compare(rKey, curKey) < 0)
                  advanceRight()
              }
              while (rRow != null && keyOrd.compare(rKey, curKey) == 0 &&
                  rTime <= t) {
                lastMatch = rRow
                advanceRight()
              }
              if (lastMatch != null) lastMatch else nullRight
            }
          project(joined(lrow, matched))
        }
      }
    }
  }

  // once per session (WeakHashMap releases dropped sessions) — per-call
  // createOrReplaceTempFunction churn warns "replaced a previously
  // registered function" on every asofJoin after the first
  private val registeredSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent registration on an EXISTING session via the public
    * experimental hooks (the builder-time equivalent is
    * [[GraftAsOfExtensions]]).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (registeredSessions.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "asof_marker", exprs => AsOfMarker(exprs), "built-in")
    if (!spark.experimental.extraOptimizations.contains(RewriteAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAsOfJoin
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** left-outer as-of join: latest `right` row per key at or before the
    * left row's time; `rightTieBreak` (compared ascending, greatest wins,
    * nulls lose) makes equal-time picks deterministic. `strategy`
    * ("auto" | "broadcast" | "sortmerge") pins the physical exec for THIS
    * join — it travels in the plan, so it holds no matter when the action
    * runs; "auto" defers to the `spark.graft.asof.strategy` conf and then
    * to broadcast-threshold statistics.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[Column] = Nil,
      strategy: String = "auto"): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    left.join(right,
      call_function("asof_marker",
        Seq(left(leftKey), right(rightKey), left(leftTime), right(rightTime),
          org.apache.spark.sql.functions.lit(strategy))
          ++ rightTieBreak: _*),
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
