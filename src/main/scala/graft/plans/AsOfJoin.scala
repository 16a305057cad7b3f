package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native FORWARD AS-OF JOIN — the whole-operator Catalyst extension
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`): for every left
  * row, the FIRST right row of the same key whose `(time, tiebreak)` is
  * lexicographically at-or-after the left's, LEFT OUTER (unmatched left
  * rows keep nulls). The canonical use is click→next-purchase attribution.
  *
  * Why a physical operator instead of composition: the composed forms
  * either shuffle BOTH relations into one per-key window pass over their
  * union (the `events_funnel` running-min trick — fine, but every right
  * row rides through the window machinery), or explode a candidate join
  * and re-aggregate (`candidates ∝ clicks × purchases-per-user`, then a
  * min-struct groupBy). The native exec is the textbook streamed merge:
  * each side is shuffled ONCE on its key, sorted `(key, time, tie)`, and
  * a single forward pass holds exactly ONE buffered right row — per
  * partition cost O(|L| + |R|), zero extra state, no window, no
  * candidate blow-up, skew-proof by construction (a hot key still costs
  * its linear scan, never quadratic candidates).
  *
  * `toleranceUs` bounds the match distance (the kdb/pandas ASOF
  * TOLERANCE clause): a candidate farther than `toleranceUs` on the
  * time axis pads with nulls instead of matching — the scan stays the
  * same single pass, only the emission test changes. Default unbounded.
  *
  * `strict = true` excludes the equal `(time, tie)` position: FORWARD
  * becomes "first right STRICTLY after", BACKWARD "last right STRICTLY
  * before" — the self-as-of catalog rows ("most recent strictly-earlier
  * purchase") need it because a purchase row must not match itself.
  * Monotonicity of the scan is unaffected: left rows ascend, so both the
  * inclusive and the strict thresholds ascend with them.
  *
  * Keys/time/tiebreak are LONG-valued expressions (`TimestampType`'s
  * internal micros qualify) — the engine's events contract; composite
  * keys pre-pack into a long (`graft_poly_hash` or bit-packing) as usual.
  * Null keys/times never match (SQL join-key semantics).
  *
  * Registered via `SparkSessionExtensions.injectPlannerStrategy`
  * (production) and `spark.experimental.extraStrategies` (live sessions)
  * — see `GraftExtensions` / `GraftFunctions.register`.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    forward: Boolean = true,
    strict: Boolean = false,
    toleranceUs: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; every other node falls
  * through to Spark's own strategies.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ltb, rtb, fwd, strict, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ltb, rtb, fwd, strict, tol) :: Nil
    case _ => Nil
  }
}

/** The streamed-merge physical operator behind [[AsOfJoinPlan]]. Declares
  * `ClusteredDistribution` on each side's key (EnsureRequirements inserts
  * the two co-partitioned hash exchanges) and `(key, time, tie)` child
  * orderings (EnsureRequirements inserts the sorts), then merges each
  * co-partition pair in one forward pass.
  *
  * The two-pointer invariant: left rows arrive in ascending
  * `(key, time, tie)`, so both directions' answers are monotone along the
  * scan — FORWARD (first right at-or-after) buffers the one right row
  * still ahead of the scan; BACKWARD (last right at-or-before) remembers
  * the one most-recently-consumed right row of the current key. Either
  * way exactly ONE buffered right row, one `copy()` per consumed right
  * row that is actually held (sort iterators reuse row objects); output
  * goes through one `UnsafeProjection` like every join exec.
  */
final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    forward: Boolean = true,
    strict: Boolean = false,
    toleranceUs: Long = Long.MaxValue) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // NON-CODEGEN BY DESIGN: this merge runs as an interpreted doExecute —
  // the same shape as Spark's own SortMergeJoin outer/non-codegen fallback.
  // The iterator carries cross-row state (the one buffered right row, the
  // current key run), which CodegenSupport's produce/consume protocol
  // cannot express without materializing the same state object the
  // interpreted loop already keeps; the children's sorts and projections
  // ARE codegen'd, and the per-row work here is two bound-reference reads
  // + one UnsafeProjection. Measured guard: tools/NativeExecGuardProbe
  // pins the O(n·log n) time signature (scaling exponent ≈ 1 vs ≈ 2 for a
  // BroadcastNestedLoop fallback), so a silent planner regression is
  // caught by time as well as by PlanSpec's plan-shape grep.
  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output // capture locally — don't serialize the node
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, lOut)
      val lt = BindReferences.bindReference(leftTime, lOut)
      val ltb = BindReferences.bindReference(leftTie, lOut)
      val rk = BindReferences.bindReference(rightKey, rOut)
      val rt = BindReferences.bindReference(rightTime, rOut)
      val rtb = BindReferences.bindReference(rightTie, rOut)
      // Project against the NODE's output (right attributes forced
      // nullable), not lOut ++ rOut: with a non-nullable right child
      // (case-class Dataset, range()) codegen against the children's
      // original nullability would skip null checks and read the all-null
      // pad row of unmatched LEFT OUTER rows as 0/garbage instead of NULL
      // — same discipline as Spark's own outer-join execs.
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // the single buffered right row (copied — sort iterators reuse rows)
      var rRow: InternalRow = null
      var rKey = 0L; var rTime = 0L; var rTie = 0L
      var rHas = false
      def advanceRight(): Unit = {
        rHas = false
        while (!rHas && rIter.hasNext) {
          val r = rIter.next()
          val k = rk.eval(r); val t = rt.eval(r); val tb = rtb.eval(r)
          if (k != null && t != null && tb != null) { // null keys never match
            rRow = r.copy()
            rKey = k.asInstanceOf[Long]
            rTime = t.asInstanceOf[Long]
            rTie = tb.asInstanceOf[Long]
            rHas = true
          }
        }
      }
      advanceRight()

      // BACKWARD direction: the last right row of the current key already
      // consumed by the scan — the candidate "at-or-before" match
      var candRow: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      var candHas = false

      lIter.map { l =>
        val k = lk.eval(l); val t = lt.eval(l); val tb = ltb.eval(l)
        if (k == null || t == null || tb == null) proj(joined(l, nullRight))
        else {
          val key = k.asInstanceOf[Long]
          val time = t.asInstanceOf[Long]
          val tie = tb.asInstanceOf[Long]
          if (forward) {
            // advance past rights before the left position — strictly
            // before for the inclusive (at-or-after) rule, at-or-before
            // for the STRICT (strictly-after) rule
            while (rHas && (rKey < key ||
                (rKey == key && (rTime < time || (rTime == time &&
                  (if (strict) rTie <= tie else rTie < tie))))))
              advanceRight()
            if (rHas && rKey == key && rTime - time <= toleranceUs)
              proj(joined(l, rRow))
            else proj(joined(l, nullRight))
          } else {
            // consume rights up to the left position (at-or-before, or
            // strictly-before when STRICT), remembering the last one of
            // THIS key — it is the backward match
            while (rHas && (rKey < key ||
                (rKey == key && (rTime < time || (rTime == time &&
                  (if (strict) rTie < tie else rTie <= tie)))))) {
              if (rKey == key) {
                candRow = rRow; candKey = key; candTime = rTime; candHas = true
              }
              advanceRight()
            }
            if (candHas && candKey == key && time - candTime <= toleranceUs)
              proj(joined(l, candRow))
            else proj(joined(l, nullRight))
          }
        }
      }
    }
  }
}
