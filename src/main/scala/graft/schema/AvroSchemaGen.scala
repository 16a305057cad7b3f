package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{JsonProperties, Schema}
import org.apache.spark.sql.types._

/** Builds the dbeam-shaped Avro record schema from a Spark `StructType`.
  *
  * Shape rules from
  * `/root/reference/dbeam-core/src/main/java/com/spotify/dbeam/avro/JdbcAvroSchema.java:106-201`:
  *   - record name = avroSchemaName or normalized table name, namespace =
  *     avroSchemaNamespace (default `dbeam_generated`), doc string defaulted
  *   - record props `tableName`, `connectionUrl`
  *   - EVERY field is `union[null, T]` with null default — even NOT NULL
  *     source columns (`JdbcAvroSchema.java:179-201`)
  *   - field names normalized `[^A-Za-z0-9_] → _` (`JdbcAvroSchema.java:369-371`)
  *   - field prop `columnName` carries the original name
  *   - logical-type annotations (`timestamp-millis`, `uuid`) only when
  *     `useAvroLogicalTypes` (`JdbcExportPipelineOptions.java:84-88`)
  *
  * Spark-type mapping mirrors the JDBC table in [[JdbcTypeMap]]: timestamps
  * and dates → long epoch-millis, decimals → string, array items
  * non-nullable unless `nullableArrayItems`.
  */
object AvroSchemaGen {

  final case class Config(
      tableName: String = "no_table_name",
      schemaName: Option[String] = None,
      namespace: String = "dbeam_generated",
      doc: Option[String] = None,
      connectionUrl: String = "",
      useLogicalTypes: Boolean = false,
      nullableArrayItems: Boolean = false
  )

  /** `typed_first_row` array-mode probe parity: the reference infers array
    * item types from the FIRST row and throws when that row's array is NULL
    * (`JdbcAvroSchema.java:277-281`). On columnar sources item types are
    * statically known, but parity mode preserves the failure contract so
    * migrating users see identical behavior.
    */
  def probeFirstRowArrays(df: org.apache.spark.sql.DataFrame): Unit = {
    val arrayCols = df.schema.fields.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    if (arrayCols.nonEmpty) {
      df.select(arrayCols.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        .limit(1).collect().headOption.foreach { row =>
          arrayCols.zipWithIndex.foreach { case (name, i) =>
            if (row.isNullAt(i))
              throw new RuntimeException(
                s"Array value is null in the first row of column $name; " +
                  "use a different arrayMode or ensure a non-null first row")
          }
        }
    }
  }

  /** `[^A-Za-z0-9_] → _` — reference `JdbcAvroSchema.java:369-371`. */
  def normalizeName(name: String): String = name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Loads a user-provided `.avsc` (`--avroSchemaFilePath`) — reference
    * `avro/BeamJdbcAvroSchema.java:98-113`: the user schema replaces
    * inference entirely, so `record.doc`, namespace, and per-field docs
    * propagate from the file (reference `README.md:138-148`).
    */
  def parseInputAvroSchemaFile(conf: org.apache.hadoop.conf.Configuration, pathStr: String): Schema = {
    val path = new org.apache.hadoop.fs.Path(pathStr)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try new Schema.Parser().parse(in)
    finally in.close()
  }

  /** Wire-compatibility gate for a user schema. The row bytes are encoded
    * from the SPARK schema ([[graft.sink.RowBinaryEncoder]] always writes
    * `union[null, T]` per field), so the user header must decode exactly
    * that — same field count and, per field, a 2-branch `[null, T]` union
    * whose value branch matches the encoder's wire type. The reference
    * trusts the user here; failing fast (exit 43) beats writing files whose
    * bytes don't match their own header.
    */
  def validateUserSchema(user: Schema, struct: StructType, nullableArrayItems: Boolean = false): Unit = {
    require(user.getType == Schema.Type.RECORD,
      s"--avroSchemaFilePath must contain a record schema, got ${user.getType}")
    val fields = user.getFields.asScala
    require(fields.size == struct.fields.length,
      s"user Avro schema has ${fields.size} fields but the query returns ${struct.fields.length} columns")
    fields.zip(struct.fields).foreach { case (af, sf) =>
      val u = af.schema()
      require(u.getType == Schema.Type.UNION && u.getTypes.size == 2 &&
        u.getTypes.get(0).getType == Schema.Type.NULL,
        s"field ${af.name}: rows are encoded as union[null, T]; user schema has ${u}")
      val value = u.getTypes.get(1)
      sf.dataType match {
        case ArrayType(elem, _) =>
          require(value.getType == Schema.Type.ARRAY,
            s"field ${af.name}: column ${sf.name} is ${sf.dataType.sql}, user schema has ${value.getType}")
          val item = value.getElementType
          val itemValue =
            if (nullableArrayItems) {
              require(item.getType == Schema.Type.UNION && item.getTypes.size == 2 &&
                item.getTypes.get(0).getType == Schema.Type.NULL,
                s"field ${af.name}: nullableArrayItems writes union[null, item] items; user schema has $item")
              item.getTypes.get(1)
            } else item
          require(itemValue.getType == wireType(elem),
            s"field ${af.name}: array items of ${sf.name} encode as ${wireType(elem)}, user schema has ${itemValue.getType}")
        case dt =>
          require(value.getType == wireType(dt),
            s"field ${af.name}: column ${sf.name} (${dt.sql}) encodes as ${wireType(dt)}, user schema has ${value.getType}")
      }
    }
  }

  /** The Avro wire type [[graft.sink.RowBinaryEncoder]] emits for a Spark
    * column type (must stay in lockstep with its `fieldEncoder`).
    */
  private def wireType(dt: DataType): Schema.Type = dt match {
    case LongType | TimestampType | TimestampNTZType | DateType => Schema.Type.LONG
    case IntegerType | ShortType | ByteType => Schema.Type.INT
    case BooleanType => Schema.Type.BOOLEAN
    case BinaryType => Schema.Type.BYTES
    case DoubleType => Schema.Type.DOUBLE
    case FloatType => Schema.Type.FLOAT
    case _: DecimalType | StringType => Schema.Type.STRING
    case other => throw new IllegalArgumentException(
      s"Unsupported column type for avro export: ${other.sql}")
  }

  def generate(struct: StructType, cfg: Config): Schema = {
    val name = normalizeName(cfg.schemaName.getOrElse(cfg.tableName))
    val doc = cfg.doc.getOrElse(s"Generate schema from JDBC ResultSet from ${cfg.connectionUrl}")
    val record = Schema.createRecord(name, doc, cfg.namespace, false)
    record.addProp("tableName", cfg.tableName)
    record.addProp("connectionUrl", cfg.connectionUrl)

    val fields = struct.fields.toSeq.map { f =>
      val valueSchema = fieldSchema(f.dataType, cfg)
      val union = Schema.createUnion(List(Schema.create(Schema.Type.NULL), valueSchema).asJava)
      val field = new Schema.Field(normalizeName(f.name), union, null, JsonProperties.NULL_VALUE)
      field.addProp("columnName", f.name)
      field.addProp("typeName", f.dataType.sql)
      field
    }
    record.setFields(fields.asJava)
    record
  }

  private def primitive(t: Schema.Type, logical: Option[String], cfg: Config): Schema = {
    val s = Schema.create(t)
    if (cfg.useLogicalTypes) logical.foreach(lt => s.addProp("logicalType", lt))
    s
  }

  private def fieldSchema(dt: DataType, cfg: Config): Schema = dt match {
    case LongType => primitive(Schema.Type.LONG, None, cfg)
    case IntegerType | ShortType | ByteType => primitive(Schema.Type.INT, None, cfg)
    case TimestampType | DateType | TimestampNTZType =>
      primitive(Schema.Type.LONG, Some("timestamp-millis"), cfg)
    case BooleanType => primitive(Schema.Type.BOOLEAN, None, cfg)
    case BinaryType => primitive(Schema.Type.BYTES, None, cfg)
    case DoubleType => primitive(Schema.Type.DOUBLE, None, cfg)
    case FloatType => primitive(Schema.Type.FLOAT, None, cfg)
    case _: DecimalType => primitive(Schema.Type.STRING, None, cfg) // decimal → string, JdbcAvroSchema.java:316-323
    case StringType => primitive(Schema.Type.STRING, None, cfg)
    case ArrayType(elem, _) =>
      val item = fieldSchema(elem, cfg)
      val itemSchema =
        if (cfg.nullableArrayItems)
          Schema.createUnion(List(Schema.create(Schema.Type.NULL), item).asJava)
        else item
      Schema.createArray(itemSchema)
    case other =>
      throw new RuntimeException(s"Unsupported column type for avro export: ${other.sql}")
  }
}
