package graft.functions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union => HllUnion}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{SetOperation, Sketches, Union => ThetaUnion}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** RE-AGGREGATION of PERSISTED sketch blobs — the cross-shard / cross-day
  * rollup a 100 TB pipeline actually runs: per-shard sketches are computed
  * incrementally (one pass over each day's data, blobs written to parquet),
  * and corpus-level statistics come from MERGING the stored blobs — the
  * original rows are never re-scanned.
  *
  * These aggregates take a BINARY column of serialized sketches (the output
  * of `graft_hll_sketch` / `graft_kll_sketch` / `graft_theta_sketch`) and
  * fold them into one sketch per group. Merge is associative and
  * order-independent for HLL and theta (register maxima / retained hash
  * sets); KLL merge is order-sensitive in its internal layout but its rank
  * error bound holds under ANY merge order — which is why the correctness
  * gate asserts rank BOUNDS, not byte equality.
  *
  * All three are `TypedImperativeAggregate`s like their build-side
  * counterparts: a live sketch per group buffer, serialized only at shuffle
  * boundaries, map-side partial merge — at scale the exchange carries one
  * compact blob per (shard × group), never data rows.
  */
case class HllMergeEstimate(
    child: Expression,
    lgK: Int = 12,
    emitBlob: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllUnion] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_merge requires serialized HLL sketch bytes, got ${other.sql}")
  }

  override def createAggregationBuffer(): HllUnion = new HllUnion(lgK)

  override def update(buffer: HllUnion, input: InternalRow): HllUnion = {
    val v = child.eval(input)
    if (v != null) buffer.update(HllSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: HllUnion, input: HllUnion): HllUnion = {
    buffer.update(input.getResult(TgtHllType.HLL_8))
    buffer
  }

  override def eval(buffer: HllUnion): Any =
    if (emitBlob) buffer.getResult(TgtHllType.HLL_8).toCompactByteArray
    else Math.round(buffer.getEstimate)

  override def serialize(buffer: HllUnion): Array[Byte] =
    buffer.getResult(TgtHllType.HLL_8).toCompactByteArray

  override def deserialize(bytes: Array[Byte]): HllUnion = {
    val u = new HllUnion(lgK)
    u.update(HllSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllMergeEstimate =
    copy(child = newChildren.head)
}

/** Merge persisted KLL blobs, then answer quantiles — same result surface
  * as [[KllQuantiles]] so the merged path and the one-pass path are
  * interchangeable downstream.
  */
case class KllMergeQuantiles(
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
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kll_merge_quantiles requires serialized KLL sketch bytes, got ${other.sql}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeQuantiles =
    copy(child = newChildren.head)
}

/** Union persisted compact theta blobs to one distinct-count estimate —
  * the one-argument rollup complement of the pairwise scalar
  * [[ThetaSetEstimate]] (which stays the right tool for cohort set
  * algebra over two stored sketches).
  */
case class ThetaMergeEstimate(
    child: Expression,
    lgK: Int = 12,
    emitBlob: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaUnion] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_merge_est requires serialized theta sketch bytes, got ${other.sql}")
  }

  override def createAggregationBuffer(): ThetaUnion =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: ThetaUnion, input: InternalRow): ThetaUnion = {
    val v = child.eval(input)
    if (v != null) buffer.union(Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: ThetaUnion, input: ThetaUnion): ThetaUnion = {
    buffer.union(input.getResult(true, null))
    buffer
  }

  override def eval(buffer: ThetaUnion): Any =
    if (emitBlob) buffer.getResult(true, null).toByteArray
    else Math.round(buffer.getResult(true, null).getEstimate)

  override def serialize(buffer: ThetaUnion): Array[Byte] =
    buffer.getResult(true, null).toByteArray

  override def deserialize(bytes: Array[Byte]): ThetaUnion = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaMergeEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaMergeEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaMergeEstimate =
    copy(child = newChildren.head)
}

/** Frequent-items blob re-aggregation — completes the persisted-sketch
  * merge surface (HLL/KLL/theta since r8, freq r9): folds serialized
  * `ItemsSketch` blobs (`graft_freq_sketch` output) and emits either the
  * top-`k` `(item, estimate)` structs or the merged blob. Merge is
  * associative but NOT idempotent (counts add, like KLL weights) — under
  * at-least-once replay, safety rests on the versioned-store layout, the
  * same argument [[graft.streaming.StreamSketch]] documents for KLL.
  * When the key's true distinct count stays ≤ `maxMapSize`, the sketch
  * never evicts and every estimate is EXACT — which is what the
  * `sketch_freq_merge_check` gate pins bit-for-bit.
  */
case class FreqMergeItems(
    child: Expression,
    k: Int = 10,
    maxMapSize: Int = 256,
    emitBlob: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]] {
  import org.apache.datasketches.common.ArrayOfStringsSerDe
  import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBlob) BinaryType else ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("estimate", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_freq_merge requires serialized frequent-items sketch bytes, got ${other.sql}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(ItemsSketch.getInstance(
      Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buffer
  }

  override def merge(buffer: ItemsSketch[String], input: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    if (emitBlob) serialize(buffer)
    else {
      val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
        .take(k)
        .map(r => InternalRow(UTF8String.fromString(r.getItem), r.getEstimate))
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqMergeItems =
    copy(child = newChildren.head)
}
