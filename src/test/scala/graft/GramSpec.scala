package graft

import org.scalatest.funsuite.AnyFunSuite

class GramSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def gram(dir: String): (Array[Array[Long]], Int) = {
    val rows = graft.operators.Similarity.embeddingGram(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val d = rows.map(_._2).max + 1
    val m = Array.ofDim[Long](d, d)
    rows.foreach { case (i, j, s) => m(i)(j) = s; m(j)(i) = s }
    (m, d)
  }

  test("r9: gram matrix equals a driver-side quantized outer-product sum") {
    val dir = SparkSpec.testDataDir
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1e6)).toArray)
    val d = 64
    val ref = Array.ofDim[Long](d, d)
    vecs.foreach { q =>
      for (i <- 0 until d; j <- i until d) {
        ref(i)(j) += q(i) * q(j); if (i != j) ref(j)(i) = ref(i)(j)
      }
    }
    // rebuild symmetric ref properly (the loop above double-writes)
    val ref2 = Array.ofDim[Long](d, d)
    vecs.foreach { q => for (i <- 0 until d; j <- 0 until d) ref2(i)(j) += q(i) * q(j) }
    val (got, gd) = gram(dir)
    assert(gd == d)
    for (i <- 0 until d; j <- 0 until d)
      assert(got(i)(j) == ref2(i)(j), s"cell ($i,$j)")
  }

  test("r9: power iteration on the gram matrix yields the dominant direction") {
    val (m, d) = gram(SparkSpec.testDataDir)
    def mul(v: Array[Double]): Array[Double] =
      Array.tabulate(d)(i => (0 until d).map(j => m(i)(j).toDouble * v(j)).sum)
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def rayleigh(v: Array[Double]): Double = {
      val u = norm(v); val mu = mul(u)
      (0 until d).map(i => u(i) * mu(i)).sum
    }
    var v = norm(Array.tabulate(d)(i => 1.0 + (i % 7)))
    for (_ <- 1 to 60) v = norm(mul(v))
    val top = rayleigh(v)
    // the dominant eigenvalue beats the Rayleigh quotient of every basis axis
    for (i <- 0 until d) {
      val e = Array.fill(d)(0.0); e(i) = 1.0
      assert(top >= rayleigh(e) - 1e-6, s"axis $i")
    }
    // and one more iteration barely moves it (converged to the
    // eigengap-limited tolerance)
    assert(math.abs(rayleigh(norm(mul(v))) - top) / top < 1e-4)
  }
}
