package graft.jobs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.types._

import graft.args.AvroSinkArgs
import graft.schema.AvroSchemaGen

/** INCREMENTAL (high-watermark) export — the nightly-delta mode every
  * production export deployment of the reference ends up scripting by
  * hand: each run exports only rows whose watermark column is STRICTLY
  * ABOVE the previous run's maximum, then persists the new maximum.
  *
  * State contract (`<stateDir>/_HIGH_WATERMARK`, two `k=v` lines):
  *   - written ONLY after a fully successful export, so a failed run
  *     re-exports the same delta on retry (at-least-once at run
  *     granularity — the per-run output dir makes retries idempotent for
  *     downstream consumers that read the latest complete dir);
  *   - strictly-greater-than filtering makes consecutive SUCCESSFUL runs
  *     non-overlapping and their union exactly the full table, provided
  *     the watermark column is append-monotone (the same contract every
  *     watermark-based CDC export assumes — late rows BELOW the watermark
  *     are the operator's responsibility, as in the reference's
  *     partition-based incrementality);
  *   - an empty delta leaves the previous watermark in place (never
  *     regresses, never writes null).
  *
  * Scale: the watermark filter is a plain Catalyst predicate — it reaches
  * the parquet scan as a pushed filter, so a run over a 100 TB table
  * reads only row groups whose stats overlap the delta; the new-max
  * aggregate is a map-combined 1-row agg over the already-filtered frame
  * with only the watermark column read.
  *
  * Supported watermark types: integral, timestamp, date, string (the
  * orderable types a JDBC splitColumn may take).
  */
object IncrementalExport {

  final case class State(column: String, maxLiteral: String)

  private def stateFile(stateDir: String) = new Path(s"$stateDir/_HIGH_WATERMARK")

  def readState(conf: Configuration, stateDir: String): Option[State] = {
    val p = stateFile(stateDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val kv = text.linesIterator.flatMap { l =>
      l.split("=", 2) match { case Array(k, v) => Some(k.trim -> v.trim); case _ => None }
    }.toMap
    for (c <- kv.get("column"); m <- kv.get("max")) yield State(c, m)
  }

  def writeState(conf: Configuration, stateDir: String, state: State): Unit =
    ExportJob.writeString(conf, stateFile(stateDir).toString,
      s"column=${state.column}\nmax=${state.maxLiteral}\n")

  /** Formats a collected max() value as a string literal that
    * `CAST('<literal>' AS <dtype>)` parses back to the same value.
    */
  private[jobs] def literalOf(v: Any): String = v match {
    case t: java.sql.Timestamp => t.toInstant.toString // ISO-8601 UTC
    case d: java.sql.Date => d.toString
    case other => other.toString
  }

  def run(
      spark: SparkSession,
      input: String,
      outputDir: String,
      stateDir: String,
      column: String,
      sinkArgs: AvroSinkArgs = AvroSinkArgs(),
      schemaCfg: AvroSchemaGen.Config = AvroSchemaGen.Config(),
      minRows: Long = -1,
      dataOnly: Boolean = false): ExportJob.Result = {

    val base = spark.read.parquet(input)
    val field = base.schema.fields.find(_.name == column).getOrElse(
      throw new IllegalArgumentException(
        s"incremental column $column not in schema ${base.schema.fieldNames.mkString(",")}"))
    field.dataType match {
      case ByteType | ShortType | IntegerType | LongType
           | TimestampType | DateType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"incremental column $column has unsupported type ${other.sql}")
    }

    val conf = spark.sparkContext.hadoopConfiguration
    val prev = readState(conf, stateDir)
    prev.foreach(s => require(s.column == column,
      s"stateDir tracks column ${s.column}, not $column — refusing to mix watermarks"))

    val delta = prev match {
      case Some(s) => base.filter(col(column) > lit(s.maxLiteral).cast(field.dataType))
      case None => base
    }

    val describe = prev match {
      case Some(s) => s"SELECT * FROM ${schemaCfg.tableName} WHERE $column > '${s.maxLiteral}'"
      case None => s"SELECT * FROM ${schemaCfg.tableName} WHERE 1=1"
    }

    val result = ExportJob.run(spark, delta, outputDir,
      sinkArgs = sinkArgs, schemaCfg = schemaCfg,
      queries = Seq(describe), minRows = minRows, dataOnly = dataOnly)

    // New watermark from the exported delta itself; an empty delta keeps
    // the previous state (and a first empty run writes nothing).
    val newMax = delta.agg(max(col(column))).head().get(0)
    val next = Option(newMax).map(v => State(column, literalOf(v))).orElse(prev)
    next.foreach(writeState(conf, stateDir, _))
    result
  }
}
