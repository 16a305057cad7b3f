package graft.schema

import java.sql.Types

import org.apache.spark.sql.types._

/** JDBC `java.sql.Types` → (Avro primitive name, Spark `DataType`) with the
  * reference's exact conversion semantics
  * (`/root/reference/dbeam-core/src/main/java/com/spotify/dbeam/avro/JdbcAvroSchema.java:217-325`,
  * `.../avro/JdbcAvroRecord.java:54-120`, `/root/reference/docs/type-conversion.md`):
  *
  *   - BIGINT → long; INTEGER/SMALLINT/TINYINT → int, EXCEPT when the driver
  *     reports `columnClassName == java.lang.Long` (MySQL unsigned int) → long
  *   - TIMESTAMP/DATE/TIME/TIME_WITH_TIMEZONE → long epoch-millis (UTC)
  *   - BOOLEAN, BIT(precision ≤ 1) → boolean; BIT(precision > 1) → bytes
  *   - BINARY/VARBINARY/LONGVARBINARY/BLOB → bytes
  *   - DOUBLE → double; FLOAT/REAL → float
  *   - OTHER with typeName `uuid` → string (uuid logical type if enabled)
  *   - STRUCT/REF/REF_CURSOR/DATALINK → unsupported (throws)
  *   - everything else, including DECIMAL/NUMERIC and all char types → string
  */
object JdbcTypeMap {

  /** Avro primitive type names for the non-null branch of union[null, T]. */
  sealed abstract class AvroPrimitive(val name: String, val spark: DataType)
  case object ALong extends AvroPrimitive("long", LongType)
  case object AInt extends AvroPrimitive("int", IntegerType)
  case object ABoolean extends AvroPrimitive("boolean", BooleanType)
  case object ABytes extends AvroPrimitive("bytes", BinaryType)
  case object ADouble extends AvroPrimitive("double", DoubleType)
  case object AFloat extends AvroPrimitive("float", FloatType)
  case object AString extends AvroPrimitive("string", StringType)

  final case class FieldMapping(
      primitive: AvroPrimitive,
      logicalType: Option[String] // annotation only, applied when useAvroLogicalTypes
  )

  private val unsupported = Set(Types.STRUCT, Types.REF, Types.REF_CURSOR, Types.DATALINK)

  /** @param sqlType java.sql.Types code
    * @param precision column precision (drives the BIT rule)
    * @param columnClassName driver-reported Java class (drives unsigned-int rule)
    * @param typeName driver-reported SQL type name (drives uuid rule)
    */
  def map(sqlType: Int, precision: Int, columnClassName: String, typeName: String): FieldMapping =
    sqlType match {
      case Types.BIGINT => FieldMapping(ALong, None)
      case Types.INTEGER | Types.SMALLINT | Types.TINYINT =>
        if (columnClassName == "java.lang.Long") FieldMapping(ALong, None)
        else FieldMapping(AInt, None)
      case Types.TIMESTAMP | Types.DATE | Types.TIME | Types.TIME_WITH_TIMEZONE =>
        FieldMapping(ALong, Some("timestamp-millis"))
      case Types.BOOLEAN => FieldMapping(ABoolean, None)
      case Types.BIT =>
        if (precision <= 1) FieldMapping(ABoolean, None) else FieldMapping(ABytes, None)
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB =>
        FieldMapping(ABytes, None)
      case Types.DOUBLE => FieldMapping(ADouble, None)
      case Types.FLOAT | Types.REAL => FieldMapping(AFloat, None)
      case Types.OTHER =>
        if (typeName != null && typeName.equalsIgnoreCase("uuid")) FieldMapping(AString, Some("uuid"))
        else FieldMapping(AString, None)
      case t if unsupported.contains(t) =>
        throw new RuntimeException(s"Unsupported jdbc column type $sqlType $typeName")
      case _ => FieldMapping(AString, None) // VARCHAR/CHAR/CLOB/DECIMAL/NUMERIC/...
    }

  /** `typed_postgres` array item mapping — Postgres `columnTypeName` must be
    * `_`-prefixed; supported: uuid/text/varchar → string, int/int4 → int,
    * int8 → long (reference `JdbcAvroSchema.java:266-275,340-367`).
    */
  def postgresArrayItem(columnTypeName: String): AvroPrimitive = {
    require(
      columnTypeName != null && columnTypeName.startsWith("_"),
      s"Unsupported postgres array item type: $columnTypeName")
    columnTypeName.substring(1).toLowerCase match {
      case "uuid" | "text" | "varchar" => AString
      case "int" | "int4" => AInt
      case "int8" => ALong
      case other => throw new IllegalArgumentException(s"Unsupported postgres array item type: $other")
    }
  }
}
