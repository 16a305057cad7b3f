package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Schema-evolution gate for the export surface: can a consumer compiled
  * against YESTERDAY's `_AVRO_SCHEMA.avsc` still read TODAY's output (and
  * vice versa)? Wraps Avro's own resolution rules
  * (`SchemaCompatibility.checkReaderWriterCompatibility`) into the three
  * verdicts a pipeline gate wants:
  *
  *   - `FULL`      — both directions resolve (e.g. added/removed fields
  *                   WITH defaults): publish freely
  *   - `BACKWARD`  — the NEW schema reads old data, but old readers break
  *                   on new data (e.g. a field was dropped): safe once
  *                   consumers re-resolve against the new sidecar — the
  *                   registry-default evolution mode, exit 0
  *   - `FORWARD`   — old readers read new data, but the new schema cannot
  *                   read history (e.g. a field added without a default):
  *                   blocks reprocessing — exit 1
  *   - `BREAKING`  — neither direction (type changed incompatibly), exit 1
  *
  * Used by [[graft.jobs.SchemaCheck]] (CLI: old.avsc new.avsc → exit 0 for
  * FULL/BACKWARD, 1 otherwise, report on stdout) — the pre-publish check a
  * daily export job runs before overwriting its schema sidecar.
  */
object SchemaCompat {

  sealed trait Verdict { def exitCode: Int }
  case object Full extends Verdict { val exitCode = 0 }
  case object Backward extends Verdict { val exitCode = 0 }
  case object Forward extends Verdict { val exitCode = 1 }
  case object Breaking extends Verdict { val exitCode = 1 }

  final case class Report(verdict: Verdict,
      newReadsOld: Boolean, oldReadsNew: Boolean,
      incompatibilities: Seq[String])

  private def compatible(reader: Schema, writer: Schema): (Boolean, Seq[String]) = {
    val r = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
    val ok = r.getType == SchemaCompatibilityType.COMPATIBLE
    val msgs =
      if (ok) Nil
      else r.getResult.getIncompatibilities.asScala.toSeq
        .map(i => s"${i.getType} at ${i.getLocation}: ${i.getMessage}")
    (ok, msgs)
  }

  /** `old` = the published schema, `next` = the candidate replacement. */
  def check(old: Schema, next: Schema): Report = {
    val (newReadsOld, m1) = compatible(reader = next, writer = old)
    val (oldReadsNew, m2) = compatible(reader = old, writer = next)
    val verdict = (newReadsOld, oldReadsNew) match {
      case (true, true) => Full
      case (true, false) => Backward
      case (false, true) => Forward
      case (false, false) => Breaking
    }
    Report(verdict, newReadsOld, oldReadsNew, (m1 ++ m2).distinct)
  }
}
