package org.mariadb.jdbc

import java.sql.{Connection, DriverPropertyInfo, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.logging.Logger

/** TEST-ONLY stand-in occupying the class name `ConnectionArgs.driverFor`
  * maps the `jdbc:mariadb` scheme to (reference
  * `JdbcConnectionUtil.java:30-48`). Same rationale as the h2/postgres
  * stubs: no vendor jars ship offline, and this class lets the UNMODIFIED
  * product path (`JdbcSource` → `spark.read.jdbc` → Spark's
  * `DriverRegistry.register("org.mariadb.jdbc.Driver")` → `driver.connect`)
  * execute the mariadb branch of the driver map end-to-end, served by
  * [[graft.jdbc.StubDb]]. Lives in `src/test` only.
  */
class Driver extends java.sql.Driver {

  override def connect(url: String, info: Properties): Connection =
    if (acceptsURL(url)) graft.jdbc.StubDb.connect(url) else null // null = not ours, per JDBC contract

  override def acceptsURL(url: String): Boolean = graft.jdbc.StubDb.acceptsMariadbUrl(url)

  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = throw new SQLFeatureNotSupportedException("stub")
}
