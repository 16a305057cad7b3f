package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.TopKHeap

/** Property tests for the bounded-heap behind `graft_topk` — the aggregate
  * the round-10 bench adjudication vindicated. The reference model is a
  * plain sort under Spark SQL's total order (Double.compare semantics:
  * NaN above +Inf, -0.0 == 0.0 with the id tiebreak), so any heap
  * sift/eviction bug, merge-order sensitivity, or serialization drift
  * shows up as a counterexample, including on the adversarial values
  * (NaN, ±Infinity, ±0.0, duplicated scores) that unit fixtures rarely
  * cover.
  */
object TopKHeapPropertySpec extends Properties("TopKHeap") {

  private val score: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e9, 1e9),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0),
    1 -> Gen.oneOf(1.0, -1.0, 0.5)) // force score ties across ids

  private val entries: Gen[List[(Long, Double)]] = for {
    n <- Gen.chooseNum(0, 200)
    scores <- Gen.listOfN(n, score)
  } yield scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  /** NaN-safe comparison key: tuple `==` is false for (x, NaN) == (x, NaN),
    * so results compare as (id, canonical bit pattern).
    */
  private def bits(xs: List[(Long, Double)]): List[(Long, Long)] =
    xs.map { case (id, s) => (id, java.lang.Double.doubleToLongBits(s)) }

  /** Spark SQL's (score desc, id asc) total order — the window-form
    * ground truth.
    */
  private def reference(xs: List[(Long, Double)], k: Int): List[(Long, Double)] =
    xs.map { case (id, s) => (id, if (s == 0.0d) 0.0d else s) } // -0.0 folds like offer()
      .sortWith { case ((id1, s1), (id2, s2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && id1 < id2)
      }.take(k)

  property("top-k equals the sort ground truth, any k, any stream") =
    Prop.forAll(entries, Gen.chooseNum(1, 50)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (id, s) => h.offer(id, s) }
      bits(h.sortedDescending.toList) == bits(reference(xs, k))
    }

  property("merge of disjoint partition heaps equals the global top-k") =
    Prop.forAll(entries, Gen.chooseNum(1, 20), Gen.chooseNum(2, 5)) { (xs, k, parts) =>
      val global = new TopKHeap(k)
      xs.foreach { case (id, s) => global.offer(id, s) }
      val merged = new TopKHeap(k)
      xs.grouped(math.max(1, xs.size / parts + 1)).foreach { slice =>
        val part = new TopKHeap(k)
        slice.foreach { case (id, s) => part.offer(id, s) }
        part.foreach(merged.offer) // TopK.merge's exact body
      }
      bits(merged.sortedDescending.toList) == bits(global.sortedDescending.toList)
    }

  property("serialize/deserialize round-trips the heap contents") =
    Prop.forAll(entries, Gen.chooseNum(1, 20)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (id, s) => h.offer(id, s) }
      bits(TopKHeap.fromBytes(h.toBytes).sortedDescending.toList) == bits(h.sortedDescending.toList)
    }
}
