package org.postgresql

import java.sql.{Connection, DriverPropertyInfo, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.logging.Logger

/** TEST-ONLY stand-in occupying the class name `ConnectionArgs.driverFor`
  * maps the `jdbc:postgresql` scheme to (reference
  * `JdbcConnectionUtil.java:30-48`). Same pattern as the `org.h2.Driver`
  * shim, but the postgres scheme matters for one thing: Spark selects
  * `PostgresDialect` from the URL prefix, and that is the only built-in
  * dialect that maps `java.sql.Types.ARRAY` columns — so the reference's
  * array modes (`avro/PostgresJdbcAvroTest.java:162-245`) can execute
  * through the UNMODIFIED product path (`JdbcSource` → `spark.read.jdbc`)
  * against [[graft.jdbc.StubDb]] tables. Accepts only `jdbc:postgresql:mem:`
  * URLs so it can never shadow a real Postgres endpoint.
  */
class Driver extends java.sql.Driver {

  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) graft.jdbc.StubDb.connect(url) else null // null = not ours, per JDBC contract

  override def acceptsURL(url: String): Boolean = graft.jdbc.StubDb.acceptsPostgresUrl(url)

  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = throw new SQLFeatureNotSupportedException("stub")
}
