package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomCodec, GraftFunctions}

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("codec round trip and reference membership") {
    val bits = new Array[Long](1024 / 64)
    Seq(1L, 42L, 999999L, -7L).foreach(BloomCodec.setBits(bits, 1024, 5, _))
    val bytes = BloomCodec.serialize(bits, 1024, 5)
    val (back, m, k) = BloomCodec.deserialize(bytes)
    assert(m == 1024 && k == 5 && back.toSeq == bits.toSeq)
    Seq(1L, 42L, 999999L, -7L).foreach(key =>
      assert(BloomCodec.contains(bytes, key), s"member $key must probe true"))
    intercept[IllegalArgumentException](BloomCodec.deserialize("junk-bytes!!".getBytes))
  }

  test("distributed build merges partial filters; no false negatives across partitions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val keys = (1L to 5000L).toDF("k").repartition(13) // force partial aggregation + merge
    val bytes = keys.agg(expr("graft_bloom_build(k, 65536, 6)")).head().getAs[Array[Byte]](0)
    (1L to 5000L).foreach(key => assert(BloomCodec.contains(bytes, key)))
    // FPR on 50k known non-members: analytic bound (1-e^(-kn/m))^k ≈ 2e-3
    // at n=5000, m=65536, k=6; assert 3x slack, deterministic (seedless hash)
    val fp = (100001L to 150000L).count(key => BloomCodec.contains(bytes, key))
    assert(fp.toDouble / 50000 < 6e-3, s"observed fpr ${fp / 50000.0} out of bound")
  }

  test("graft_bloom_contains codegen equals the codec on a non-literal column") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bytes = (1L to 100L).toDF("k")
      .agg(expr("graft_bloom_build(k, 4096, 4)")).head().getAs[Array[Byte]](0)
    val lit = s"X'${bytes.map("%02X".format(_)).mkString}'"
    val rows = (1L to 200L).toDF("k")
      .selectExpr("k", s"graft_bloom_contains($lit, k) AS hit").collect()
    rows.foreach { r =>
      assert(r.getBoolean(1) == BloomCodec.contains(bytes, r.getLong(0)),
        s"codegen/codec disagree at key ${r.getLong(0)}")
    }
    assert(rows.filter(_.getLong(0) <= 100).forall(_.getBoolean(1)))
  }

  test("bloomSemiJoin output equals the plain semi-join (pruning is invisible)") {
    val dir = SparkSpec.testDataDir
    val got = graft.operators.Relational.bloomSemiJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val keys = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 450000.0).select("o_orderkey")
    val want = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("bigint")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce matching rows")
  }

  test("bloom gate: no false negatives and bounded fpr on the orders fixture") {
    val r = graft.operators.Relational.bloomFprCheck(spark, SparkSpec.testDataDir).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0, "both member classes must be non-empty")
    assert(r.getBoolean(2), "bloom filter produced a false negative")
    assert(r.getBoolean(3), "observed fpr out of bound")
  }
}
