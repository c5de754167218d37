package graft

import java.sql.{Connection, DriverManager, SQLException}

/** Shared JDBC plumbing for the control-plane stores — credentials
  * (ConnectAuth), grants (GraftAuthz), the catalog registry
  * (JdbcCatalogStore) and gateway discovery (GatewayDiscovery) all
  * talk to the same kind of database and previously each carried
  * their own copy of this logic.
  */
private[graft] object ControlPlaneDb {

  def withConn[A](url: String, user: Option[String], password: Option[String])
      (f: Connection => A): A = {
    val conn = user match {
      case Some(u) => DriverManager.getConnection(url, u, password.orNull)
      case None => DriverManager.getConnection(url)
    }
    try f(conn) finally conn.close()
  }

  /** CREATE TABLE IF NOT EXISTS, portably: most DBs have no uniform
    * duplicate-table SQLState (Derby X0Y32, PostgreSQL 42P07, MySQL
    * 42S01), so on ANY DDL failure probe whether the table is in fact
    * usable and only rethrow when it is not — concurrent creators race
    * benignly.
    */
  def ensureTable(url: String, user: Option[String], password: Option[String],
      ddl: String, probeTable: String): Unit =
    withConn(url, user, password) { conn =>
      try conn.createStatement().execute(ddl)
      catch {
        case e: SQLException =>
          val usable =
            try {
              conn.createStatement()
                .executeQuery(s"SELECT 1 FROM $probeTable WHERE 1 = 0").close()
              true
            } catch { case _: SQLException => false }
          if (!usable) throw e
      }
    }

  /** True when `e` is the DB's duplicate-key violation (23505 is the
    * SQL-standard state; MySQL reports 23000).
    */
  def isDuplicateKey(e: SQLException): Boolean =
    e.getSQLState == "23505" || e.getSQLState == "23000"
}
