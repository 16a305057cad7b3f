package graft

import java.sql.Types

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{AvroSchemaGen, JdbcTypeMap}
import graft.schema.JdbcTypeMap._

/** Type-mapping goldens from the reference's conversion table
  * (`avro/JdbcAvroSchema.java:217-325`, `docs/type-conversion.md`,
  * asserted in `avro/JdbcAvroRecordTest.java:95-152`).
  */
class JdbcTypeMapSpec extends AnyFunSuite {

  private def m(t: Int, precision: Int = 0, cls: String = "", name: String = "") =
    JdbcTypeMap.map(t, precision, cls, name)

  test("integral types") {
    assert(m(Types.BIGINT).primitive == ALong)
    assert(m(Types.INTEGER).primitive == AInt)
    assert(m(Types.SMALLINT).primitive == AInt)
    assert(m(Types.TINYINT).primitive == AInt)
  }

  test("MySQL unsigned int surfaces as java.lang.Long -> long") {
    assert(m(Types.INTEGER, cls = "java.lang.Long").primitive == ALong)
  }

  test("temporal types are epoch-millis longs with timestamp-millis annotation") {
    for (t <- Seq(Types.TIMESTAMP, Types.DATE, Types.TIME, Types.TIME_WITH_TIMEZONE)) {
      val fm = m(t)
      assert(fm.primitive == ALong)
      assert(fm.logicalType.contains("timestamp-millis"))
    }
  }

  test("BIT precision rule") {
    assert(m(Types.BIT, precision = 1).primitive == ABoolean)
    assert(m(Types.BIT, precision = 0).primitive == ABoolean)
    assert(m(Types.BIT, precision = 8).primitive == ABytes)
  }

  test("binary types") {
    for (t <- Seq(Types.BINARY, Types.VARBINARY, Types.LONGVARBINARY, Types.BLOB))
      assert(m(t).primitive == ABytes)
  }

  test("floating point") {
    assert(m(Types.DOUBLE).primitive == ADouble)
    assert(m(Types.FLOAT).primitive == AFloat)
    assert(m(Types.REAL).primitive == AFloat)
  }

  test("OTHER uuid -> string with uuid annotation") {
    val fm = m(Types.OTHER, name = "uuid")
    assert(fm.primitive == AString)
    assert(fm.logicalType.contains("uuid"))
    assert(m(Types.OTHER, name = "jsonb").primitive == AString)
  }

  test("DECIMAL/NUMERIC and char types fall through to string") {
    for (t <- Seq(Types.DECIMAL, Types.NUMERIC, Types.VARCHAR, Types.CHAR, Types.CLOB,
        Types.LONGNVARCHAR, Types.LONGVARCHAR, Types.NCHAR))
      assert(m(t).primitive == AString)
  }

  test("STRUCT/REF/REF_CURSOR/DATALINK unsupported") {
    for (t <- Seq(Types.STRUCT, Types.REF, Types.REF_CURSOR, Types.DATALINK))
      assertThrows[RuntimeException](m(t))
  }

  test("typed_postgres array items") {
    assert(JdbcTypeMap.postgresArrayItem("_uuid") == AString)
    assert(JdbcTypeMap.postgresArrayItem("_text") == AString)
    assert(JdbcTypeMap.postgresArrayItem("_varchar") == AString)
    assert(JdbcTypeMap.postgresArrayItem("_int4") == AInt)
    assert(JdbcTypeMap.postgresArrayItem("_int") == AInt)
    assert(JdbcTypeMap.postgresArrayItem("_int8") == ALong)
    assertThrows[IllegalArgumentException](JdbcTypeMap.postgresArrayItem("int4")) // missing _
    assertThrows[IllegalArgumentException](JdbcTypeMap.postgresArrayItem("_float8"))
  }
}

/** Avro schema shape goldens — COFFEES-equivalent StructType, expectations
  * from `avro/JdbcAvroRecordTest.java:77-152` (all fields union[null,T] with
  * null default, decimal → string, timestamps → long).
  */
class AvroSchemaGenSpec extends AnyFunSuite {

  private val coffees = StructType(Seq(
    StructField("COF_NAME", StringType, nullable = false),
    StructField("SUP_ID", IntegerType),
    StructField("PRICE", DecimalType(21, 2), nullable = false),
    StructField("TEMPERATURE", FloatType, nullable = false),
    StructField("SIZE", DoubleType, nullable = false),
    StructField("IS_ARABIC", BooleanType, nullable = false),
    StructField("SALES", IntegerType, nullable = false),
    StructField("TOTAL", LongType, nullable = false),
    StructField("CREATED", TimestampType, nullable = false),
    StructField("UPDATED", TimestampType),
    StructField("UID", BinaryType, nullable = false),
    StructField("ROWNUM", LongType, nullable = false),
    StructField("INT_ARR", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("TEXT_ARR", ArrayType(StringType, containsNull = false), nullable = false)
  ))

  private val cfg = AvroSchemaGen.Config(
    tableName = "COFFEES",
    connectionUrl = "jdbc:h2:mem:test",
    doc = Some("Generate schema from JDBC ResultSet from jdbc:h2:mem:test"))

  private lazy val schema = AvroSchemaGen.generate(coffees, cfg)

  test("record identity and props") {
    assert(schema.getType == Schema.Type.RECORD)
    assert(schema.getName == "COFFEES")
    assert(schema.getNamespace == "dbeam_generated")
    assert(schema.getProp("tableName") == "COFFEES")
    assert(schema.getProp("connectionUrl") == "jdbc:h2:mem:test")
    assert(schema.getFields.size == 14)
  }

  test("every field is union[null, T] with null default, even NOT NULL columns") {
    schema.getFields.asScala.foreach { f =>
      assert(f.schema.getType == Schema.Type.UNION, f.name)
      assert(f.schema.getTypes.get(0).getType == Schema.Type.NULL, f.name)
      assert(f.schema.getTypes.size == 2, f.name)
      assert(f.hasDefaultValue, f.name)
    }
  }

  private def branch(name: String): Schema =
    schema.getField(name).schema.getTypes.get(1)

  test("field types follow the dbeam conversion table") {
    assert(branch("COF_NAME").getType == Schema.Type.STRING)
    assert(branch("SUP_ID").getType == Schema.Type.INT)
    assert(branch("PRICE").getType == Schema.Type.STRING) // decimal -> string
    assert(branch("TEMPERATURE").getType == Schema.Type.FLOAT)
    assert(branch("SIZE").getType == Schema.Type.DOUBLE)
    assert(branch("IS_ARABIC").getType == Schema.Type.BOOLEAN)
    assert(branch("TOTAL").getType == Schema.Type.LONG)
    assert(branch("CREATED").getType == Schema.Type.LONG) // timestamp -> epoch millis
    assert(branch("UID").getType == Schema.Type.BYTES)
    assert(branch("INT_ARR").getType == Schema.Type.ARRAY)
    assert(branch("INT_ARR").getElementType.getType == Schema.Type.INT)
    assert(branch("TEXT_ARR").getElementType.getType == Schema.Type.STRING)
  }

  test("no logical types unless enabled") {
    assert(branch("CREATED").getProp("logicalType") == null)
    val withLt = AvroSchemaGen.generate(coffees, cfg.copy(useLogicalTypes = true))
    assert(withLt.getField("CREATED").schema.getTypes.get(1).getProp("logicalType") == "timestamp-millis")
  }

  test("name normalization [^A-Za-z0-9_] -> _") {
    assert(AvroSchemaGen.normalizeName("we ird-col.name") == "we_ird_col_name")
    val s = AvroSchemaGen.generate(
      StructType(Seq(StructField("col with space", StringType))),
      AvroSchemaGen.Config(tableName = "ta ble"))
    assert(s.getName == "ta_ble")
    assert(s.getFields.get(0).name == "col_with_space")
    assert(s.getFields.get(0).getProp("columnName") == "col with space")
  }

  test("nullable array items become union items") {
    val s = AvroSchemaGen.generate(
      StructType(Seq(StructField("arr", ArrayType(IntegerType)))),
      AvroSchemaGen.Config(nullableArrayItems = true))
    val item = s.getFields.get(0).schema.getTypes.get(1).getElementType
    assert(item.getType == Schema.Type.UNION)
    assert(item.getTypes.get(0).getType == Schema.Type.NULL)
  }
}
