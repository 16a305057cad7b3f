package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** SemDeDup / deterministic k-means (`cluster_kmeans`, `dedup_semdedup`).
  *
  * The catalog rows pin both queries bit-for-bit against the DuckDB
  * oracle's unrolled Lloyd iteration; this spec pins the three claims the
  * oracle cannot see:
  *   1. partitioning invariance — the integer-micros arithmetic makes the
  *      WHOLE clustering independent of physical layout (the determinism
  *      argument, exercised rather than asserted);
  *   2. agreement with an INDEPENDENT plain-Scala model of the spec
  *      (quantize HALF_UP → seed by id rank → argmin with smallest-index
  *      ties → trunc(Σq/n) update), so the SQL fold and the Scala loop
  *      cannot drift apart without a counterexample;
  *   3. the SemDeDup keep rule on planted inputs — an exact copy lands in
  *      its original's cluster and is dropped (greedy min-id), a zero-norm
  *      vector never pairs and is always kept.
  */
class SemDeDupSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private def emb = spark.read.parquet(s"${SparkSpec.testDataDir}/embeddings.parquet")
    .select("vec_id", "embedding")

  test("kmeans assignment is invariant under physical partitioning") {
    val a = Dedup.kmeansMicroAssign(emb, k = 8, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.kmeansMicroAssign(emb.repartition(7), k = 8, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    assert(a.map(_._1).size == a.size) // one row per vec_id
  }

  test("kmeans matches an independent driver-side model of the spec") {
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def quant(x: Float): Long =
      BigDecimal.valueOf(x.toDouble * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val q = rows.map { case (id, v) => (id, v.map(quant)) }
    val k = 8
    var cents = q.take(k).map(_._2.map(identity)) // seeds: k smallest ids
    def assign(p: Array[Long]): (Int, Long) = {
      var bj = 0; var bd = Long.MaxValue
      for (j <- 0 until k) {
        var d = 0L
        var i = 0
        while (i < p.length) { val g = p(i) - cents(j)(i); d += g * g; i += 1 }
        if (d < bd) { bd = d; bj = j } // strict: ties keep the smaller j
      }
      (bj, bd)
    }
    for (_ <- 1 to 2) {
      val byCluster = q.groupBy { case (_, p) => assign(p)._1 }
      cents = Array.tabulate(k) { j =>
        byCluster.get(j) match {
          case None => cents(j)
          case Some(members) =>
            val dim = members.head._2.length
            Array.tabulate(dim) { d =>
              val s = members.map(_._2(d)).sum
              (s.toDouble / members.length).toLong
            }
        }
      }
    }
    val want = q.map { case (id, p) => val (j, d) = assign(p); (id, j.toLong, d) }.toSet
    val got = Dedup.kmeansMicroAssign(emb, k, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("semDeDup drops a planted exact copy, keeps zero-norm vectors") {
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val copy = emb.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val zero = spark.createDataFrame(
      java.util.List.of(Row(100001L, Seq.fill(dim)(0.0f))),
      emb.schema)
    val out = Dedup.semDeDupFrom(emb.unionByName(copy).unionByName(zero))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(out.length == byId.size) // one row per vector
    // the exact copy has identical micros => identical cluster; greedy
    // min-id drops the copy, keeps the original
    assert(byId(100000L)._2 == byId(0L)._2)
    assert(!byId(100000L)._3 && byId(0L)._3)
    // zero-norm: cluster-assigned but never paired — always kept
    assert(byId(100001L)._3)
  }

  test("kmeansKFor holds cluster size linear in the corpus") {
    assert(Dedup.kmeansKFor(500, 4096) == 1)
    assert(Dedup.kmeansKFor(1L << 20, 4096) == 256)
    // r15 clamp: 2^16 — the broadcast-join assignment's supported range
    // (beyond it the corpus shards first, k does not grow)
    assert(Dedup.kmeansKFor(Long.MaxValue / 4, 4096) == (1 << 16)) // clamp
    intercept[IllegalArgumentException](Dedup.kmeansKFor(0, 4096))
  }
}
