package org.h2

import java.sql.{Connection, DriverPropertyInfo, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.logging.Logger

/** TEST-ONLY stand-in occupying the class name `ConnectionArgs.driverFor`
  * maps the `jdbc:h2` scheme to (reference `JdbcConnectionUtil.java:30-48`).
  * The real H2 jar is absent offline (SURVEY §7.5 risk 5); the reference's
  * own job tests run against `jdbc:h2:mem:test`
  * (`jobs/JdbcAvroJobTest.java:83`), and this class lets the UNMODIFIED
  * product path (`JdbcSource` → `spark.read.jdbc` → Spark's
  * `DriverRegistry.register("org.h2.Driver")` → `driver.connect`) execute
  * the same way, served by [[graft.jdbc.StubDb]]'s in-memory tables.
  * Lives in `src/test` only — it is a test fixture, never shipped.
  */
class Driver extends java.sql.Driver {

  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) graft.jdbc.StubDb.connect(url) else null // null = not ours, per JDBC contract

  override def acceptsURL(url: String): Boolean = graft.jdbc.StubDb.acceptsUrl(url)

  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = throw new SQLFeatureNotSupportedException("stub")
}
