package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Approximate quantiles via a DataSketches KLL sketch — the streaming /
  * mergeable counterpart of the exact rank-based percentiles in
  * `Relational.percentileDisc`.
  *
  * Why KLL and not Spark's `percentile_approx` (GK sketch): KLL has a
  * PROVEN worst-case rank error bound (~1.65%·(1/k)·√log) independent of
  * data order, and its serialized bytes are mergeable across any
  * DataSketches-speaking system — at 100 TB a training-data pipeline
  * computes per-shard sketches incrementally and merges them, never
  * re-scanning the corpus. `k = 200` → ±~1.7% rank error at 99% confidence.
  *
  * Result: `array<double>` of the requested quantiles (INCLUSIVE search
  * criteria, the DataSketches default).
  *
  * With `emitBlob = true` (SQL: `graft_kll_sketch`) the aggregate returns
  * the serialized sketch instead — the per-shard blob later rolled up by
  * [[KllMergeQuantiles]] without re-scanning the rows (`ranks` is unused
  * in that mode).
  */
case class KllQuantiles(
    child: Expression,
    ranks: Seq[Double],
    k: Int = 200,
    emitBlob: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitBlob) BinaryType else ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantiles does not support ${other.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case other => throw new IllegalStateException(s"unsupported $other")
      }
      buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, input: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any =
    if (emitBlob) buffer.toByteArray
    else if (buffer.isEmpty) ArrayData.toArrayData(Array.fill(ranks.length)(Double.NaN))
    else ArrayData.toArrayData(
      ranks.map(r => buffer.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)).toArray)

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}
