package com.mysql.cj.jdbc

import java.sql.{Connection, DriverPropertyInfo, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.logging.Logger

/** TEST-ONLY stand-in occupying the class name `ConnectionArgs.driverFor`
  * maps the `jdbc:mysql` scheme to (reference
  * `JdbcConnectionUtil.java:30-48`). `jdbc:mysql:mem:<db>` additionally
  * selects Spark's `MySQLDialect`, so the runtime read exercises the
  * dialect's identifier quoting and type mapping — including the
  * unsigned-INTEGER→long rule (reference `JdbcAvroRecordTest.java:252-272`:
  * the MySQL driver reports unsigned INT columns as
  * `columnClassName == java.lang.Long`; at the Spark layer the same fact
  * arrives as `isSigned == false`). Served by [[graft.jdbc.StubDb]];
  * `src/test` only.
  */
class Driver extends java.sql.Driver {

  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) graft.jdbc.StubDb.connect(url) else null // null = not ours, per JDBC contract

  override def acceptsURL(url: String): Boolean = graft.jdbc.StubDb.acceptsMysqlUrl(url)

  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = throw new SQLFeatureNotSupportedException("stub")
}
