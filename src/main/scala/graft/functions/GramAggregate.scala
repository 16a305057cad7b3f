package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** EXACT distributed Gram (scatter) matrix of an embedding column — the
  * `Σ x xᵀ` accumulation behind PCA/whitening/linear probes, in integer
  * arithmetic: each component is quantized to `round(x · scale)` (micro
  * units by default) and the upper triangle of quantized outer products is
  * summed exactly, so the result is bit-deterministic and DuckDB-oracle
  * checkable. Covariance follows driver-side from the Gram matrix plus the
  * per-dim sums (`embedding_centroid`) and n.
  *
  * Why a custom `TypedImperativeAggregate`: the compositional form
  * (posexplode twice or a self-join on the row id) materializes d²·n rows
  * through a shuffle — at d=64 that is a 4096× row amplification. This
  * aggregate keeps ONE d(d+1)/2-long buffer (2,080 longs = 16 KB at d=64)
  * per partition, map-side combines, and ships only buffers: the shuffle
  * carries |groups| × 16 KB regardless of corpus size.
  *
  * Overflow bound: |q| ≤ scale for unit-normalized inputs, so each product
  * is ≤ scale² and the sum needs `n · scale² < 2^63` — 9×10^6 rows at the
  * default 1e6 scale; larger corpora pass a smaller scale (the bound is a
  * require in the doc contract, checked by the caller).
  *
  * Result: `array<struct<i int, j int, s bigint>>`, upper triangle
  * (i ≤ j) in row-major order.
  */
case class GramMatrix(
    child: Expression,
    dim: Int,
    scale: Long = 1000000L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1 && dim <= 512, s"graft_gram dim must be in [1, 512]: $dim")
  private val tri = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram requires array<float|double>, got ${other.sql}")
  }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      val q = new Array[Long](dim) // missing/short dims contribute 0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          q(i) = math.round(x * scale)
        }
        i += 1
      }
      var p = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buffer(p) += q(i) * q(j)
          p += 1; j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var p = 0
    while (p < tri) { buffer(p) += input(p); p += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val rows = new Array[Any](tri)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        rows(p) = InternalRow(i, j, buffer(p))
        p += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(tri * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(tri)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}
