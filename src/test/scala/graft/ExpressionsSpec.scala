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

  test("graft_poly_hash non-BMP chars: code-point semantics, matches DuckDB") {
    GraftFunctions.register(spark)
    // 'a😀b' = code points [97, 128512, 98]; DuckDB
    // list_reduce over string_split(s,'')/ord gives 4077187 (verified
    // against duckdb directly) — code points are the canonical semantics,
    // and the native expression implements them.
    val r = spark.sql(
      s"SELECT graft_poly_hash('a😀b', 31, ${Portable.P1}L) AS native").head()
    assert(r.getLong(0) == 4077187L, "native must fold Unicode code points like DuckDB ord()")
    // the HOF formulation must agree on non-BMP too (split('')/ascii are
    // code-point aware in Spark) — pin it so a regression is caught
    val hof = spark.range(1).select(lit("a😀b").as("s"))
      .select(Portable.polyHash("s", 31, Portable.P1).as("hof")).head()
    assert(hof.getLong(0) == 4077187L,
      s"HOF poly hash diverges from code-point semantics on non-BMP: ${hof.getLong(0)}")
  }

  test("graft_poly_hash_array / graft_hash60_array == HOF transform forms") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"${SparkSpec.testDataDir}/documents.parquet")
      .createOrReplaceTempView("expr_docs")
    val diff = spark.sql(
      s"""SELECT * FROM (
         |SELECT
         | graft_poly_hash_array(sh, 31, ${Portable.P1}L) AS native_ph,
         | transform(sh, s -> graft_poly_hash(s, 31, ${Portable.P1}L)) AS hof_ph,
         | graft_hash60_array(sh) AS native_h60,
         | transform(sh, s -> (graft_poly_hash(s, 31, ${Portable.P1}L) * 1073741824L)
         |                  + (graft_poly_hash(s, 37, ${Portable.P2}L) % 1073741824L)) AS hof_h60
         |FROM (SELECT split(trim(text), '\\\\s+') AS sh FROM expr_docs)
         |) WHERE native_ph != hof_ph OR native_h60 != hof_h60""".stripMargin)
    assert(diff.count() == 0)
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
    // both paths share GraftFunctions.builders — every engine function must
    // be present and resolvable after registration
    val expected = Set("graft_poly_hash", "graft_dot", "graft_minhash", "graft_simhash",
      "graft_poly_hash_array", "graft_hash60_array", "graft_lsh_buckets",
      "graft_hll_distinct", "graft_kll_quantiles", "graft_freq_items",
      "graft_theta_sketch", "graft_theta_union_est", "graft_theta_intersect_est",
      "graft_theta_diff_est")
    assert(GraftFunctions.builders.map(_._1).toSet == expected)
    val registry = s2.sessionState.functionRegistry
    expected.foreach { name =>
      assert(registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered")
    }
  }
}
