package graft

import org.apache.avro.Schema
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaCompat

class SchemaCompatSpec extends AnyFunSuite {

  private def rec(fields: String): Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"t","fields":[$fields]}""")

  private val base = rec("""{"name":"a","type":"long"},{"name":"b","type":"string"}""")

  test("r9: adding a field WITH default is FULL; without default is BACKWARD") {
    val withDefault = rec(
      """{"name":"a","type":"long"},{"name":"b","type":"string"},
        |{"name":"c","type":["null","long"],"default":null}""".stripMargin)
    assert(SchemaCompat.check(base, withDefault).verdict == SchemaCompat.Full)
    val noDefault = rec(
      """{"name":"a","type":"long"},{"name":"b","type":"string"},{"name":"c","type":"long"}""")
    val r = SchemaCompat.check(base, noDefault)
    // the new schema cannot fill c from old data; old readers skip it fine
    assert(r.verdict == SchemaCompat.Forward && r.verdict.exitCode == 1)
  }

  test("r9: dropping a field is BACKWARD (new reads old); type change is BREAKING") {
    val dropped = rec("""{"name":"a","type":"long"}""")
    assert(SchemaCompat.check(base, dropped).verdict == SchemaCompat.Backward)
    val retyped = rec("""{"name":"a","type":"string"},{"name":"b","type":"string"}""")
    val r = SchemaCompat.check(base, retyped)
    assert(r.verdict == SchemaCompat.Breaking && r.incompatibilities.nonEmpty)
  }

  test("r9: identical and long->widened schemas are FULL") {
    assert(SchemaCompat.check(base, base).verdict == SchemaCompat.Full)
    // long -> double widening resolves one way only per Avro rules
    val widened = rec("""{"name":"a","type":"double"},{"name":"b","type":"string"}""")
    val r = SchemaCompat.check(base, widened)
    assert(r.newReadsOld && !r.oldReadsNew && r.verdict == SchemaCompat.Backward)
  }
}
