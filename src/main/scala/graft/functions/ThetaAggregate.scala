package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate — the mergeable-sketch family member that supports
  * SET ALGEBRA: unlike HLL (union-only), compact theta sketches intersect
  * and difference, so distinct-count questions ACROSS cohorts ("how many
  * users did both X and Y") need one pass per cohort, never a pairwise
  * distinct join. The compact-ordered byte form is canonical (the retained
  * hash set is order-independent), so results are deterministic under any
  * partitioning.
  *
  * Result: the compact sketch as `binary` — feed it to [[ThetaSetEstimate]]
  * for union/intersection estimates, or ship it to any
  * DataSketches-speaking system.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | DoubleType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_sketch does not support ${other.sql}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      child.dataType match {
        case LongType => buffer.update(v.asInstanceOf[Long])
        case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
        case DoubleType => buffer.update(v.asInstanceOf[Double])
        case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
        case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
        case other => throw new IllegalStateException(s"unsupported $other")
      }
    }
    buffer
  }

  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult(true, null))
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult(true, null).toByteArray // compact ordered = canonical

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Scalar set-operation estimates over two serialized compact theta
  * sketches: `op` ∈ {union, intersect, diff} (diff = A\B). Returns the
  * rounded estimate. Runs on sketch rows (cohort counts, not data rows) —
  * CodegenFallback is fine at that cardinality.
  */
case class ThetaSetEstimate(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType &&
        (op == "union" || op == "intersect" || op == "diff")) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_$op requires two binary sketch arguments")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketches.wrapCompactSketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketches.wrapCompactSketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    val result: CompactSketch = op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(a); u.union(b)
        u.getResult(true, null)
      case "intersect" =>
        val i: Intersection = SetOperation.builder().buildIntersection()
        i.intersect(a); i.intersect(b)
        i.getResult(true, null)
      case "diff" =>
        SetOperation.builder().buildANotB().aNotB(a, b)
    }
    Math.round(result.getEstimate)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ThetaSetEstimate =
    copy(left = newLeft, right = newRight)
}
