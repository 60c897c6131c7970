package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator as-of join, Catalyst-native: a custom LogicalPlan +
  * SparkStrategy + SparkPlan (registered through
  * SparkSessionExtensions.injectPlannerStrategy by GraftExtensions).
  *
  * Where the composed forms in [[graft.operators.AsOfJoin]] re-express the
  * semantics over existing operators (union + window last(), or range join
  * + row_number), this exec owns the physical algorithm: both sides hash-
  * cluster on the key and sort by (key, time) — the same exchange+sort a
  * sort-merge join would need, which EnsureRequirements inserts (and AQE
  * tunes) for free — then ONE forward-only merge pass per partition emits
  * each left row with the payload of the latest right row at-or-before its
  * time. No timeline union, no window buffering, no within-window
  * quadratic re-scan: O(|L| + |R|) work and O(1) state (a single buffered
  * right payload) per partition after the sort.
  *
  * Semantics are those of AsOfJoin.asOf, asserted row-identical in
  * JoinsSpec: latest right row with rightTime <= leftTime per key; right
  * rows tied on (key, time) resolve to the largest payload (the exec
  * requires the right side additionally sorted by the payload columns
  * ascending and lets the last tied row win); null keys match null keys
  * (window-partition semantics, not SQL-join null semantics); a null right
  * time sorts before every non-null time ("at-or-before anything"), so it
  * is visible to every left row of its key — including a left row whose
  * own time is null, which sees ONLY null-time right rows. */
/** @param lowerBound optional tolerance floor: a LEFT-side column
  *                    (precomputed as leftTime - tolerance by the API
  *                    wrapper, so the analyzer owns the datetime
  *                    arithmetic) below which a buffered match is
  *                    discarded — the bounded-lookback discipline of
  *                    AsOfJoin.asOfRange, at merge-scan cost. Bound
  *                    columns are excluded from the output. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        payload: Seq[Attribute],
                        lowerBound: Option[Attribute] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output.filterNot(a => lowerBound.exists(_.exprId == a.exprId)) ++
      payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode to its exec; a no-op for every other node. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, payload, lo) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload, lo) :: Nil
    case _ => Nil
  }
}

/** Optimizer support for the custom node (injected via
  * injectOptimizerRule): Catalyst's stock rules treat an unknown
  * LogicalPlan as a wall, so without these a filter or narrow projection
  * above an as-of join would never reach the scans below it. Three
  * rewrites, each justified by the operator's exactly-one-output-row-per-
  * left-row contract:
  *
  *   1. Left-side filter pushdown: a deterministic predicate over left
  *      columns commutes with the join (it can only drop whole left rows,
  *      which drop exactly their output rows). Payload predicates stay
  *      put — they depend on the matched right row.
  *   2. Left-side column pruning: left columns are pure pass-through, so
  *      ones a projection above never references (beyond the key, time,
  *      and tolerance-bound columns the merge itself reads) are pruned
  *      below the node and the scan narrows. The right side is NOT
  *      prunable this way: the payload list doubles as the (key, time)
  *      tie-break ordering, so dropping an unused payload column would
  *      change which tied right row wins for the columns that remain.
  *   3. Join elimination: when nothing from the right side is referenced
  *      at all, the join is a per-left-row no-op and the node collapses
  *      to its left child (minus any internal tolerance-bound column).
  */
class AsOfJoinOptimizations extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // (1) push left-only conjuncts below the node
    case f @ Filter(cond, aj: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    // (3) eliminate the join when no payload column is used
    case p @ Project(_, aj: AsOfJoinNode)
        if aj.payload.forall(a => !p.references.contains(a)) =>
      p.copy(child = aj.lowerBound match {
        case Some(lo) => Project(aj.left.output.filterNot(_.exprId == lo.exprId), aj.left)
        case None => aj.left
      })

    // (2) prune left pass-through columns the projection never uses
    case p @ Project(_, aj: AsOfJoinNode)
        if aj.left.output.exists(a => !isLeftNeeded(p.references, aj, a)) =>
      val keep = aj.left.output.filter(a => isLeftNeeded(p.references, aj, a))
      p.copy(child = aj.copy(left = Project(keep, aj.left)))
  }

  private def isLeftNeeded(used: org.apache.spark.sql.catalyst.expressions.AttributeSet,
                           aj: AsOfJoinNode, a: Attribute): Boolean =
    used.contains(a) || a.exprId == aj.leftKey.exprId ||
      a.exprId == aj.leftTime.exprId || aj.lowerBound.exists(_.exprId == a.exprId)
}

/** Merge-scan as-of join exec. Children arrive hash-clustered on the key
  * and sorted by (key asc, time asc) — right additionally by the payload
  * columns, so the last right row consumed for a (key, time) tie carries
  * the largest payload, matching the composed form's tie-break. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        payload: Seq[Attribute],
                        lowerBound: Option[Attribute] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output.filterNot(a => lowerBound.exists(_.exprId == a.exprId)) ++
      payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      (Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        payload.map(p => SortOrder(p, Ascending))) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Left rows pass through in order — the sort is preserved for parents. */
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  @transient private lazy val keyOrdering =
    TypeUtils.getInterpretedOrdering(leftKey.dataType)
  @transient private lazy val timeOrdering =
    TypeUtils.getInterpretedOrdering(leftTime.dataType)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val loOrd = lowerBound.map(b => left.output.indexWhere(_.exprId == b.exprId))
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val kOrd = keyOrdering
    val tOrd = timeOrdering
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output
    val payloadAttrs = payload

    // nulls-first three-way compare, mirroring the Ascending NullsFirst
    // sort the children arrive in
    def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightAttrs)
      // payload slots are nullable in the OUTPUT even when the right-side
      // schema says non-null (a left row with no match emits nulls) — bind
      // with widened nullability or the projection would read the null
      // slot as a primitive zero
      val resultProj = UnsafeProjection.create(outAttrs,
        leftAttrs ++ payloadAttrs.map(_.withNullability(true)))
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.length)

      new Iterator[InternalRow] {
        // the one peeked-but-unconsumed right row (rows from the upstream
        // sorter reuse buffers, so consumed state is copied immediately)
        private var rHead: InternalRow = _
        private var rHeadValid = false
        // payload (and copied right time) of the best right row seen for
        // the CURRENT left key
        private var matched: InternalRow = _
        private var matchedTime: Any = _
        // copied key value the buffered `matched` belongs to
        private var matchedKey: Any = _
        private var matchedKeySet = false

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val k = if (lRow.isNullAt(lkOrd)) null else lRow.get(lkOrd, keyType)
          val t = if (lRow.isNullAt(ltOrd)) null else lRow.get(ltOrd, timeType)
          if (!matchedKeySet || cmp(kOrd, matchedKey, k) != 0) {
            matched = null
            matchedKey = InternalRow.copyValue(k)
            matchedKeySet = true
          }
          // consume right rows at-or-before (k, t); the last one wins
          var advancing = true
          while (advancing) {
            if (!rHeadValid && rIter.hasNext) { rHead = rIter.next(); rHeadValid = true }
            if (!rHeadValid) advancing = false
            else {
              val rk = if (rHead.isNullAt(rkOrd)) null else rHead.get(rkOrd, keyType)
              val kc = cmp(kOrd, rk, k)
              if (kc > 0) advancing = false
              else if (kc < 0) rHeadValid = false // right-only key: skip
              else {
                val rt = if (rHead.isNullAt(rtOrd)) null else rHead.get(rtOrd, timeType)
                if (cmp(tOrd, rt, t) <= 0) {
                  matched = payloadProj(rHead).copy()
                  matchedTime = InternalRow.copyValue(rt)
                  rHeadValid = false
                } else advancing = false
              }
            }
          }
          // bounded lookback: with a tolerance floor, the latest
          // at-or-before match only counts when its time is >= the floor
          // (null floor — null left time minus tolerance — or null right
          // time never match, mirroring the range-join SQL the tolerance
          // form composes)
          val valid = matched != null && (loOrd match {
            case None => true
            case Some(o) =>
              val lo = if (lRow.isNullAt(o)) null else lRow.get(o, timeType)
              lo != null && matchedTime != null && cmp(tOrd, matchedTime, lo) >= 0
          })
          numOutputRows += 1
          resultProj(joined(lRow, if (valid) matched else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
