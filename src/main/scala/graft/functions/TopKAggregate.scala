package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** EXACT per-group top-k as a bounded-heap aggregate —
  * `graft_topk(id, score, k)` → `array<struct<id bigint, score double>>`
  * ordered by (score desc, id asc).
  *
  * This is the 100 TB replacement for the `row_number() OVER (PARTITION BY
  * g ORDER BY s DESC) <= k` pattern: the window form shuffles and sorts
  * EVERY row of the group, while this aggregate keeps a k-element heap per
  * group and — because it is a proper partial/merge aggregate — each map
  * task forwards AT MOST k rows per group to the shuffle, regardless of
  * group size. Exact (not sketched): the merge of per-partition top-k
  * heaps provably contains the global top-k. Determinism on score ties
  * comes from the id tiebreak (ids are unique).
  *
  * Buffer is a plain array treated as a binary min-heap keyed by the
  * EVICTION order (worst = lowest score, then highest id, at the root).
  */
case class TopK(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0 && k <= (1 << 20), s"graft_topk: k out of range: $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (idExpr.dataType, scoreExpr.dataType) match {
    case (LongType | IntegerType, _: NumericType) => TypeCheckResult.TypeCheckSuccess
    case (idT, sT) => TypeCheckResult.TypeCheckFailure(
      s"graft_topk requires (id: bigint/int, score: numeric), got (${idT.sql}, ${sT.sql})")
  }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  // Null scores are SKIPPED — standard SQL aggregate semantics (like
  // sum/avg ignoring nulls). NOTE this differs from the row_number window
  // form, which ranks null scores last under DESC: a null score cannot
  // hold a top-k slot here. Pinned by TopKSpec.
  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val idV = idExpr.eval(input)
    val sV = scoreExpr.eval(input)
    if (idV != null && sV != null) {
      val id = idV match {
        case i: Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      val score = sV match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
      }
      buffer.offer(id, score)
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val rows = buffer.sortedDescending.map { case (id, s) => InternalRow(id, s) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

/** Bounded top-k min-heap over (id, score): the WORST element — lowest
  * score, then highest id — sits at the root and is evicted first, so the
  * heap always holds the best k seen.
  */
final class TopKHeap(val k: Int) {
  private var n = 0
  private var ids = new Array[Long](math.min(k, 16))
  private var scores = new Array[Double](math.min(k, 16))

  /** true if (id1, s1) ranks WORSE than (id2, s2) in the output order.
    * `Double.compare` gives a TOTAL order — NaN sorts above +Inf, exactly
    * Spark's SQL ordering (so NaN scores rank FIRST under desc, matching
    * the row_number window form) and never wedges the heap the way raw
    * `<`/`==` would (both false for any NaN comparison).
    */
  @inline private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && id1 > id2)
  }

  private def grow(): Unit = if (n == ids.length && n < k) {
    val cap = math.min(k, ids.length * 2)
    ids = java.util.Arrays.copyOf(ids, cap)
    scores = java.util.Arrays.copyOf(scores, cap)
  }

  def offer(id: Long, score0: Double): Unit = {
    // -0.0 == 0.0 in SQL comparisons (tie broken by id), but Double.compare
    // separates them — normalize so the total order agrees with SQL
    val score = if (score0 == 0.0d) 0.0d else score0
    if (n < k) {
      grow()
      ids(n) = id; scores(n) = score
      n += 1
      var i = n - 1 // sift up
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      ids(0) = id; scores(0) = score
      var i = 0 // sift down
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
  }

  def foreach(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < n) { f(ids(i), scores(i)); i += 1 }
  }

  /** (id, score) pairs, best first: (score desc, id asc) under the same
    * NaN-safe total order as [[worse]].
    */
  def sortedDescending: Array[(Long, Double)] =
    (0 until n).map(i => (ids(i), scores(i))).toArray
      .sortWith { case ((id1, s1), (id2, s2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && id1 < id2)
      }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { h.offer(bb.getLong(), bb.getDouble()); i += 1 }
    h
  }
}
