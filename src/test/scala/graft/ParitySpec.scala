package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.args.QueryArgs
import graft.schema.AvroSchemaGen
import graft.sources.ParquetSource
import graft.sql.QueryBuilder

/** Strict-parity behaviors: dbeam's divided per-split limit (may undershoot)
  * and the typed_first_row array probe failure contract.
  */
class ParitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("parity mode: per-split limit/k can undershoot like the reference (L2)") {
    val src = ParquetSource(
      s"${SparkSpec.testDataDir}/lineitem.parquet", "lineitem",
      QueryArgs(QueryBuilder.fromTable("lineitem"),
        limit = Some(10),
        splitColumn = Some("l_orderkey"),
        queryParallelism = Some(3)))
    val rows = src.readParityMode(spark).collect()
    // 3 splits x LIMIT 10/3=3 -> at most 9, never 10
    assert(rows.length <= 9, s"got ${rows.length}")
    assert(rows.length > 0)
    // engine-native mode returns the exact limit
    assert(src.read(spark).count() == 10)
  }

  test("parity mode without limit reproduces the full table via ranges") {
    val src = ParquetSource(
      s"${SparkSpec.testDataDir}/lineitem.parquet", "lineitem",
      QueryArgs(QueryBuilder.fromTable("lineitem"),
        splitColumn = Some("l_orderkey"),
        queryParallelism = Some(8)))
    val total = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet").count()
    assert(src.readParityMode(spark).count() == total)
  }

  test("typed_first_row probe: null array in first row throws (1.4 mode 2)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("arr", ArrayType(IntegerType))))
    val bad = spark.createDataFrame(
      Seq(Row(1L, null), Row(2L, Seq(1, 2))).asJava, schema).coalesce(1)
    val e = intercept[RuntimeException](AvroSchemaGen.probeFirstRowArrays(bad.orderBy("id")))
    assert(e.getMessage.contains("first row"))
    val good = spark.createDataFrame(
      Seq(Row(2L, Seq(1, 2)), Row(1L, null)).asJava, schema).coalesce(1)
    AvroSchemaGen.probeFirstRowArrays(good.orderBy(org.apache.spark.sql.functions.desc("id")))
    AvroSchemaGen.probeFirstRowArrays(spark.createDataFrame(
      Seq.empty[Row].asJava, schema)) // empty table: probe is a no-op
  }
}
