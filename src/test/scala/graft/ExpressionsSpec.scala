package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, Portable}

/** The native codegen expressions must produce EXACTLY the values of their
  * HOF formulations (same fold order / arithmetic) — the DuckDB oracles
  * depend on it.
  */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("graft_poly_hash == HOF poly hash on documents text") {
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"${SparkSpec.testDataDir}/documents.parquet")
    val diff = docs.select(
      Portable.polyHash("text", 31, Portable.P1).as("hof"),
      Portable.polyHashNative("text", 31, Portable.P1).as("native"))
      .filter(col("hof") =!= col("native"))
    assert(diff.count() == 0)
    // edge cases: empty string, unicode, single char
    val edge = spark.sql(
      s"SELECT graft_poly_hash('', 31, ${Portable.P1}L) AS e, " +
        s"graft_poly_hash('a', 31, ${Portable.P1}L) AS a").head()
    assert(edge.getLong(0) == 0L)
    assert(edge.getLong(1) == 'a'.toLong)
  }

  test("graft_dot == HOF dot product on embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(s"${SparkSpec.testDataDir}/embeddings.parquet")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea")).limit(50)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb")).limit(50)
    val diff = a.crossJoin(b).select(
      Portable.dotProduct("ea", "eb").as("hof"),
      Portable.dotProductNative("ea", "eb").as("native"))
      .filter(col("hof") =!= col("native")) // bit-exact double equality
    assert(diff.count() == 0)
  }

  test("GraftExtensions registers functions in a fresh session") {
    val s2 = SparkSpec.spark.newSession()
    new graft.functions.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions() {})
    // extensions object applies at builder time; for a live session use register()
    GraftFunctions.register(s2)
    assert(s2.sql(s"SELECT graft_poly_hash('abc', 31, ${Portable.P1}L)").head().getLong(0) ==
      (('a'.toLong * 31 + 'b') * 31 + 'c') % Portable.P1)
  }
}
