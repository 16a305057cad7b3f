package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet, Statement}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.args.{ConnectionArgs, QueryArgs}
import graft.sources.JdbcSource
import graft.sql.QueryBuilder

/** The reference's per-writer query protocol (`JdbcAvroIO.java:174-201`,
  * order asserted by the reference's `JdbcAvroJobTest.java:182-219`)
  * verified against a recording fake `Connection` — the testable part of
  * U10/preCommand without a JDBC driver jar in the sandbox: preCommands
  * run on the SAME connection strictly BEFORE the main query, in list
  * order, and the `StatementPreparator`-style hook touches the prepared
  * main statement before execution.
  */
class JdbcProtocolSpec extends AnyFunSuite {

  /** Reflective fake: every interface call appends to `log`; methods that
    * must return a JDBC object return another recording proxy.
    */
  private def recordingConnection(log: ArrayBuffer[String]): Connection = {
    def proxy[T](iface: Class[T], name: String): T =
      iface.cast(Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
        new InvocationHandler {
          override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
            // Object methods (equals/hashCode/toString from asserts or
            // collections) are not protocol events
            if (m.getDeclaringClass == classOf[Object]) return m.getName match {
              case "equals" => java.lang.Boolean.valueOf(p.asInstanceOf[AnyRef] eq args(0))
              case "hashCode" => Integer.valueOf(System.identityHashCode(p))
              case _ => s"fake-$name"
            }
            val shown = m.getName match {
              case "prepareStatement" => s"prepareStatement(${args(0)})"
              case "execute" => s"$name.execute(${args(0)})"
              case "executeQuery" => s"$name.executeQuery"
              case "setFetchSize" => s"$name.setFetchSize(${args(0)})"
              case other => s"$name.$other"
            }
            log += shown
            m.getName match {
              case "prepareStatement" => proxy(classOf[PreparedStatement], "main")
              case "createStatement" => proxy(classOf[Statement], "pre")
              case "executeQuery" => proxy(classOf[ResultSet], "rs")
              case "execute" => java.lang.Boolean.TRUE
              case _ =>
                // primitive-returning JDBC getters need a non-null box
                if (m.getReturnType == java.lang.Boolean.TYPE) java.lang.Boolean.FALSE
                else if (m.getReturnType == java.lang.Integer.TYPE) Integer.valueOf(0)
                else null
            }
          }
        }))
    proxy(classOf[Connection], "conn")
  }

  private def source(pre: Seq[String],
      prep: Option[PreparedStatement => Unit] = None): JdbcSource =
    JdbcSource(
      ConnectionArgs("jdbc:postgresql://h/db"),
      QueryArgs(QueryBuilder.fromTable("tab")),
      fetchSize = 1234,
      preCommands = pre,
      statementPreparator = prep)

  test("preCommands run on the same connection, in order, before the main query") {
    val log = ArrayBuffer[String]()
    val conn = recordingConnection(log)
    val rs = source(Seq("SET a = 1", "SET b = 2"))
      .executeQueryWithPreCommands(conn, "SELECT * FROM tab WHERE 1=1")
    assert(rs != null)
    assert(log.toSeq == Seq(
      "prepareStatement(SELECT * FROM tab WHERE 1=1)",
      "main.setFetchSize(1234)",
      "conn.createStatement", // same recording connection — no second one exists
      "pre.execute(SET a = 1)",
      "pre.execute(SET b = 2)",
      "main.executeQuery"))
  }

  test("no preCommands -> no extra statement, just prepare/fetchSize/execute") {
    val log = ArrayBuffer[String]()
    source(Nil).executeQueryWithPreCommands(recordingConnection(log), "Q")
    assert(log.toSeq == Seq("prepareStatement(Q)", "main.setFetchSize(1234)", "main.executeQuery"))
  }

  test("statementPreparator hook touches the prepared statement before execution") {
    val log = ArrayBuffer[String]()
    val prep: PreparedStatement => Unit = st => { st.setFetchSize(99); log += "hook-done" }
    source(Seq("SET x = 0"), Some(prep))
      .executeQueryWithPreCommands(recordingConnection(log), "Q")
    val i = log.indexOf("hook-done")
    assert(i >= 0 && i < log.indexOf("pre.execute(SET x = 0)"),
      s"hook must run before preCommands+query: $log")
    assert(log.last == "main.executeQuery")
  }

  test("spark read path maps preCommands to sessionInitStatement") {
    // the Spark-native equivalent: Spark executes sessionInitStatement on
    // each opened connection before reading — same per-connection
    // semantics as the reference's per-writer preCommands
    val m = classOf[JdbcSource].getDeclaredMethod("props")
    m.setAccessible(true)
    val p = m.invoke(source(Seq("SET a = 1", "SET b = 2")))
      .asInstanceOf[java.util.Properties]
    assert(p.getProperty("sessionInitStatement") == "SET a = 1; SET b = 2")
    val none = m.invoke(source(Nil)).asInstanceOf[java.util.Properties]
    assert(none.getProperty("sessionInitStatement") == null)
  }
}
