package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native KEYED INTERVAL JOIN — the second whole-operator Catalyst
  * extension (after [[AsOfJoinPlan]]): INNER-joins every left row to the
  * right rows of the SAME key whose time lies in
  * `[leftTime + lowDeltaUs, leftTime + highDeltaUs]` (both bounds
  * inclusive; negative deltas look backward — e.g. `(-30 min, -1 µs)` is
  * "strictly prior within 30 minutes"). The canonical use is windowed
  * feature extraction: per event, its same-user neighborhood.
  *
  * Why a physical operator: the composed forms either bucketize the time
  * axis and explode each probe row into adjacent buckets (the
  * `events_range_join` shape — fine, but every probe row is duplicated
  * per bucket and every candidate pair re-checks the predicate after a
  * hash join), or fall into Spark's nested-loop fallback for pure range
  * predicates. The native exec is the textbook sweep: each side shuffled
  * ONCE on its key, sorted `(key, time, tie)`, and a single forward pass
  * holds a SLIDING BUFFER of exactly the right rows inside the current
  * left row's window — per partition cost O(|L| + |R| + output), buffer
  * bounded by the densest single-key window (the state bound a streaming
  * interval join's watermark enforces, here enforced by the window width
  * itself).
  *
  * The two-pointer invariant: left rows ascend in `(key, time)`, so both
  * window ends `leftTime + low` / `leftTime + high` ascend too — every
  * right row is appended once and evicted once, never revisited.
  * Unmatched left rows emit nothing (INNER; the composed left-outer
  * catalog rows remain for outer semantics). Null keys/times never match.
  *
  * Keys/time/tiebreak are LONG-valued expressions (`TimestampType`
  * micros), the [[AsOfJoinPlan]] contract.
  */
final case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    lowDeltaUs: Long, highDeltaUs: Long) extends BinaryNode {
  require(lowDeltaUs <= highDeltaUs,
    s"interval join window is empty: [$lowDeltaUs, $highDeltaUs]")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lt, rt, ltb, rtb, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ltb, rtb, lo, hi) :: Nil
    case _ => Nil
  }
}

/** The sweeping physical operator behind [[IntervalJoinPlan]]. Same
  * distribution/ordering contract as [[AsOfJoinExec]]: one co-partitioned
  * hash exchange and one `(key, time, tie)` sort per side, inserted by
  * EnsureRequirements.
  */
final case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    lowDeltaUs: Long, highDeltaUs: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  // NON-CODEGEN BY DESIGN — see the matching note on AsOfJoinExec: the
  // sweep's sliding buffer is cross-row state the produce/consume codegen
  // protocol can't express better than this interpreted loop; children
  // stay codegen'd. tools/NativeExecGuardProbe pins the linear time
  // signature so a fallback to BroadcastNestedLoop shows up as a scaling
  // exponent ≈ 2, independent of plan-shape greps.
  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lo, hi) = (lowDeltaUs, highDeltaUs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, lOut)
      val lt = BindReferences.bindReference(leftTime, lOut)
      val rk = BindReferences.bindReference(rightKey, rOut)
      val rt = BindReferences.bindReference(rightTime, rOut)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      // the one right row read ahead of the sweep
      var rRow: InternalRow = null
      var rKey = 0L; var rTime = 0L
      var rHas = false
      def advanceRight(): Unit = {
        rHas = false
        while (!rHas && rIter.hasNext) {
          val r = rIter.next()
          val k = rk.eval(r); val t = rt.eval(r)
          if (k != null && t != null) {
            rRow = r // copied only if it enters the buffer
            rKey = k.asInstanceOf[Long]
            rTime = t.asInstanceOf[Long]
            rHas = true
          }
        }
      }
      advanceRight()

      // sliding window of right rows of the CURRENT key, times ascending
      val bufRows = new java.util.ArrayDeque[InternalRow]()
      val bufTimes = new java.util.ArrayDeque[java.lang.Long]()
      var bufKey = 0L

      lIter.flatMap { l =>
        val k = lk.eval(l); val t = lt.eval(l)
        if (k == null || t == null) Iterator.empty
        else {
          val key = k.asInstanceOf[Long]
          val time = t.asInstanceOf[Long]
          // key advanced past the buffered key: the whole buffer is stale
          if (bufKey != key && !bufRows.isEmpty) { bufRows.clear(); bufTimes.clear() }
          // Window tests as DIFFERENCES (`rTime - time <= hi`), never as
          // shifted bounds (`rTime <= time + hi`): epoch-micro differences
          // cannot overflow (~2^52 apart at most), while `time + hi`
          // overflows for unbounded-style deltas (hi near Long.MaxValue
          // silently matched NOTHING) — the r15 plans deep-read finding,
          // and the same form AsOfJoinExec already uses for tolerance.
          // consume rights up to the window's upper end for this left row
          while (rHas && (rKey < key || (rKey == key && rTime - time <= hi))) {
            if (rKey == key && rTime - time >= lo) { // can still match
              bufRows.addLast(rRow.copy())
              bufTimes.addLast(rTime)
              bufKey = key
            } // rights below the (ascending) lower end can never match again
            advanceRight()
          }
          // evict buffered rights that fell below the lower end
          while (!bufTimes.isEmpty && bufTimes.peekFirst() - time < lo) {
            bufTimes.removeFirst(); bufRows.removeFirst()
          }
          if (bufRows.isEmpty) Iterator.empty
          else {
            // snapshot iteration: the buffer is stable until the next left row
            val it = bufRows.iterator()
            new Iterator[InternalRow] {
              override def hasNext: Boolean = it.hasNext
              override def next(): InternalRow = proj(joined(l, it.next()))
            }
          }
        }
      }
    }
  }
}
