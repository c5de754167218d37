package graft

import org.apache.spark.sql.SparkSession

/** Engine-level authorization for the multi-tenant gateway — the
  * capability the reference platform gets from Kyuubi's engine-side
  * authorization plugin (reference internal/controller/kyuubi.go
  * fronts a shared Spark engine for many tenants; without object-level
  * grants every authenticated tenant could read or drop every other
  * tenant's tables). Authentication (ConnectAuth, C22) answers WHO is
  * calling; this module answers what they may TOUCH.
  *
  * Model (the Databricks/Hive-SQL-standard shape, reduced to what a
  * lakehouse catalog needs):
  *
  *   - principals are the user names ConnectAuth verified;
  *   - securables are catalog namespaces (`db`) and tables (`db.t`);
  *   - privileges are ordered `SELECT < MODIFY < ALL` — MODIFY (DDL +
  *     DML) implies read, ALL additionally covers grant-worthy
  *     ownership; a namespace-level grant covers every table in it;
  *   - superusers (the engine operators) bypass checks entirely.
  *
  * Grants persist in the SAME kind of JDBC store as the credential
  * table (Derby in the sandbox, any JDBC database in production), so
  * one metastore-adjacent DB carries both who-can-connect and
  * who-can-touch-what, and every gateway host sharing the DB enforces
  * identical policy.
  *
  * Identity chain: [[GraftAuthIdentity.current]] resolves the acting
  * principal for a session. For a Spark Connect RPC that is the
  * session-holder's userId — which [[GraftAuthInterceptor]] binds to
  * the AUTHENTICATED user when ConnectAuth is enabled (a request whose
  * `user_context.user_id` differs from its verified `graft_user` is
  * rejected before any handler runs), so a tenant cannot spoof another
  * tenant's identity by picking their `user_id`. Embedded sessions
  * fall back to the `spark.graft.sql.user` conf, then the process
  * user (the session owner IS the operator there).
  */
object GraftAuthz {

  /** Thrown on a denied access; the message carries PERMISSION_DENIED
    * so remote (Connect) clients see the cause verbatim in the error
    * chain.
    */
  final class AccessDenied(msg: String) extends RuntimeException(msg)

  final case class Config(jdbcUrl: String, superusers: Set[String],
      jdbcUser: Option[String], jdbcPassword: Option[String],
      cacheTtlMillis: Long)

  private val Privs = Map("SELECT" -> 1, "MODIFY" -> 2, "ALL" -> 3)

  @volatile private var cfg: Option[Config] = None
  // (principal, securable) -> (best privilege level, verified-at). A
  // revoked grant stops working within the TTL; grant/revoke from this
  // JVM clear the cache immediately.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  /** Enable enforcement. Creates the grants + policies tables if
    * absent.
    */
  def enable(jdbcUrl: String, superusers: Set[String],
      jdbcUser: Option[String] = None, jdbcPassword: Option[String] = None,
      cacheTtlMillis: Long = 60000L): Unit = {
    ControlPlaneDb.ensureTable(jdbcUrl, jdbcUser, jdbcPassword,
      "CREATE TABLE graft_grants(principal VARCHAR(128), ns VARCHAR(128), " +
        "tbl VARCHAR(128), priv VARCHAR(16))", "graft_grants")
    ControlPlaneDb.ensureTable(jdbcUrl, jdbcUser, jdbcPassword,
      "CREATE TABLE graft_policies(principal VARCHAR(128), ns VARCHAR(128), " +
        "tbl VARCHAR(128), kind CHAR(1), col VARCHAR(128), sql_text VARCHAR(4096))",
      "graft_policies")
    cache.clear(); policyCache.clear()
    cfg = Some(Config(jdbcUrl, superusers, jdbcUser, jdbcPassword, cacheTtlMillis))
    // Enforcement implies an audit trail (C28): decisions land in the
    // same control-plane DB, asynchronously (GraftAudit.scala).
    GraftAudit.enable(jdbcUrl, jdbcUser, jdbcPassword)
  }

  def disable(): Unit = {
    cfg = None; cache.clear(); policyCache.clear()
    GraftAudit.disable()
  }

  def required: Boolean = cfg.isDefined

  private def withConn[A](url: String, u: Option[String], p: Option[String])
      (f: java.sql.Connection => A): A = ControlPlaneDb.withConn(url, u, p)(f)

  private def split(securable: String): (String, String) =
    securable.split('.') match {
      case Array(ns) => (ns, "*")
      case parts => (parts.init.mkString("."), parts.last)
    }

  /** Grant `privilege` (SELECT | MODIFY | ALL) on `securable` (`db` or
    * `db.t`) to `principal`. Idempotent (duplicate rows are harmless:
    * checks take the max privilege).
    */
  def grant(principal: String, securable: String, privilege: String): Unit = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val lvl = Privs.getOrElse(privilege.toUpperCase,
      throw new IllegalArgumentException(s"unknown privilege $privilege"))
    require(lvl >= 1)
    val (ns, tbl) = split(securable)
    withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val ps = conn.prepareStatement(
        "INSERT INTO graft_grants(principal, ns, tbl, priv) VALUES (?, ?, ?, ?)")
      ps.setString(1, principal); ps.setString(2, ns)
      ps.setString(3, tbl); ps.setString(4, privilege.toUpperCase)
      ps.executeUpdate()
    }
    cache.clear()
    GraftAudit.record(principal, s"GRANT ${privilege.toUpperCase}", securable, "admin")
  }

  /** Revoke every grant of `privilege` on `securable` from `principal`. */
  def revoke(principal: String, securable: String, privilege: String): Unit = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val (ns, tbl) = split(securable)
    withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val ps = conn.prepareStatement(
        "DELETE FROM graft_grants WHERE principal = ? AND ns = ? AND tbl = ? AND priv = ?")
      ps.setString(1, principal); ps.setString(2, ns)
      ps.setString(3, tbl); ps.setString(4, privilege.toUpperCase)
      ps.executeUpdate()
    }
    cache.clear()
    GraftAudit.record(principal, s"REVOKE ${privilege.toUpperCase}", securable, "admin")
  }

  /** Highest privilege level `principal` holds on (`ns`, `tbl`):
    * direct table grants, namespace-level grants (tbl='*'), and
    * global grants (ns='*') all count.
    */
  private def levelFor(c: Config, principal: String, ns: String, tbl: String): Int = {
    val key = principal + "\u0000" + ns + "\u0000" + tbl
    val now = System.currentTimeMillis()
    val hit = cache.get(key)
    if (hit != null && now - hit._2 < c.cacheTtlMillis) return hit._1
    val lvl = withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val ps = conn.prepareStatement(
        "SELECT priv FROM graft_grants WHERE principal = ? AND " +
          "(ns = ? OR ns = '*') AND (tbl = ? OR tbl = '*')")
      ps.setString(1, principal); ps.setString(2, ns); ps.setString(3, tbl)
      val rs = ps.executeQuery()
      var best = 0
      try while (rs.next()) best = math.max(best, Privs.getOrElse(rs.getString(1), 0))
      finally rs.close()
      best
    }
    cache.put(key, (lvl, now))
    lvl
  }

  private def check(spark: SparkSession, ns: String, tbl: String, need: Int,
      verb: String): Unit = cfg.foreach { c =>
    val principal = GraftAuthIdentity.current(spark)
    val securable = if (tbl == "*") ns else s"$ns.$tbl"
    if (!c.superusers.contains(principal) && levelFor(c, principal, ns, tbl) < need) {
      GraftAudit.record(principal, verb, securable, "deny")
      throw new AccessDenied(
        s"PERMISSION_DENIED: principal '$principal' lacks $verb on " +
          (if (tbl == "*") s"namespace '$ns'" else s"table '$ns.$tbl'"))
    }
    GraftAudit.record(principal, verb, securable, "allow")
  }

  /** No-ops unless enforcement is enabled. `table` = "*" checks the
    * namespace itself (CREATE/DROP NAMESPACE, namespace-wide verbs).
    */
  def requireSelect(spark: SparkSession, ns: String, table: String): Unit =
    check(spark, ns, table, Privs("SELECT"), "SELECT")

  def requireModify(spark: SparkSession, ns: String, table: String): Unit =
    check(spark, ns, table, Privs("MODIFY"), "MODIFY")

  /** True iff the current principal may write (`ns`.`table`). Used by
    * the catalog to hand out read-only table handles instead of
    * failing the read-path load.
    */
  def mayModify(spark: SparkSession, ns: String, table: String): Boolean =
    accessLevel(spark, ns, table) >= Privs("MODIFY")

  /** The current principal's effective level on (`ns`,`table`) in ONE
    * identity resolution + ONE (cached) grants lookup — the hot-path
    * variant for the catalog's load-and-mark-writability sequence.
    * Disabled enforcement and superusers report full access.
    */
  def accessLevel(spark: SparkSession, ns: String, table: String): Int =
    cfg.fold(Privs("ALL")) { c =>
      val principal = GraftAuthIdentity.current(spark)
      if (c.superusers.contains(principal)) Privs("ALL")
      else levelFor(c, principal, ns, table)
    }

  private[graft] val SelectLevel = Privs("SELECT")
  private[graft] val ModifyLevel = Privs("MODIFY")

  // ---- row filters & column masks (fine-grained access control) ----
  // The Databricks/Ranger capability on top of the grant model: a ROW
  // FILTER is a boolean SQL expression over the table's columns that
  // a principal's reads are silently restricted to; a COLUMN MASK is
  // an expression substituted for a column's value. Policies apply at
  // ANALYSIS time (plans/RowPolicy.scala) so they compose with every
  // read surface; a principal with any policy on a table loses write
  // access to it (a row they cannot see must not be updatable).

  final case class Policies(rowFilter: Option[String], masks: Map[String, String]) {
    def isEmpty: Boolean = rowFilter.isEmpty && masks.isEmpty
  }
  private val NoPolicies = Policies(None, Map.empty)
  private val policyCache = new java.util.concurrent.ConcurrentHashMap[String, (Policies, Long)]()

  /** Restrict `principal`'s reads of `securable` to rows satisfying
    * `filterSql` (replaces any previous filter).
    */
  def setRowFilter(principal: String, securable: String, filterSql: String): Unit =
    setPolicy(principal, securable, "F", "*", filterSql)

  /** Substitute `maskSql` for column `col` in `principal`'s reads. */
  def setColumnMask(principal: String, securable: String, col: String, maskSql: String): Unit =
    setPolicy(principal, securable, "M", col, maskSql)

  private def setPolicy(principal: String, securable: String, kind: String,
      col: String, sqlText: String): Unit = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val (ns, tbl) = split(securable)
    withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val del = conn.prepareStatement(
        "DELETE FROM graft_policies WHERE principal = ? AND ns = ? AND tbl = ? AND kind = ? AND col = ?")
      del.setString(1, principal); del.setString(2, ns); del.setString(3, tbl)
      del.setString(4, kind); del.setString(5, col)
      del.executeUpdate()
      val ins = conn.prepareStatement(
        "INSERT INTO graft_policies(principal, ns, tbl, kind, col, sql_text) VALUES (?, ?, ?, ?, ?, ?)")
      ins.setString(1, principal); ins.setString(2, ns); ins.setString(3, tbl)
      ins.setString(4, kind); ins.setString(5, col); ins.setString(6, sqlText)
      ins.executeUpdate()
    }
    policyCache.clear()
  }

  /** Drop every policy `principal` has on `securable`. */
  def dropPolicies(principal: String, securable: String): Unit = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val (ns, tbl) = split(securable)
    withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val ps = conn.prepareStatement(
        "DELETE FROM graft_policies WHERE principal = ? AND ns = ? AND tbl = ?")
      ps.setString(1, principal); ps.setString(2, ns); ps.setString(3, tbl)
      ps.executeUpdate()
    }
    policyCache.clear()
  }

  /** The current principal's policies on (`ns`,`tbl`). Superusers and
    * disabled enforcement see none. TTL-cached like grants.
    */
  def policiesFor(spark: SparkSession, ns: String, tbl: String): Policies =
    cfg.fold(NoPolicies) { c =>
      val principal = GraftAuthIdentity.current(spark)
      if (c.superusers.contains(principal)) NoPolicies
      else {
        val key = principal + "\u0000" + ns + "\u0000" + tbl
        val now = System.currentTimeMillis()
        val hit = policyCache.get(key)
        if (hit != null && now - hit._2 < c.cacheTtlMillis) hit._1
        else {
          val p = withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
            val ps = conn.prepareStatement(
              "SELECT kind, col, sql_text FROM graft_policies WHERE principal = ? AND ns = ? AND tbl = ?")
            ps.setString(1, principal); ps.setString(2, ns); ps.setString(3, tbl)
            val rs = ps.executeQuery()
            var filter: Option[String] = None
            val masks = scala.collection.mutable.Map.empty[String, String]
            try while (rs.next()) {
              if (rs.getString(1) == "F") filter = Some(rs.getString(3))
              else masks(rs.getString(2)) = rs.getString(3)
            } finally rs.close()
            Policies(filter, masks.toMap)
          }
          policyCache.put(key, (p, now))
          p
        }
      }
    }

  /** Authority to GRANT/REVOKE/inspect grants on `securable`:
    * superuser, or ALL on the securable (directly or via its
    * namespace). Also fails when enforcement is off — granting into a
    * disabled policy would silently do nothing.
    */
  def requireGrantAuthority(spark: SparkSession, securable: String): Unit = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val principal = GraftAuthIdentity.current(spark)
    val (ns, tbl) = split(securable)
    if (!c.superusers.contains(principal) && levelFor(c, principal, ns, tbl) < Privs("ALL")) {
      GraftAudit.record(principal, "GRANT_ADMIN", securable, "deny")
      throw new AccessDenied(
        s"PERMISSION_DENIED: principal '$principal' lacks grant authority (ALL) on '$securable'")
    }
  }

  /** Every (principal, privilege) granted directly on `securable`
    * (table rows for a table, namespace rows for a namespace).
    */
  def grants(securable: String): Seq[(String, String)] = {
    val c = cfg.getOrElse(throw new IllegalStateException("GraftAuthz is not enabled"))
    val (ns, tbl) = split(securable)
    withConn(c.jdbcUrl, c.jdbcUser, c.jdbcPassword) { conn =>
      val ps = conn.prepareStatement(
        "SELECT principal, priv FROM graft_grants WHERE ns = ? AND tbl = ?")
      ps.setString(1, ns); ps.setString(2, tbl)
      val rs = ps.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      try while (rs.next()) out += (rs.getString(1) -> rs.getString(2))
      finally rs.close()
      out.toSeq
    }
  }

  /** Remote (Connect) tenants must go THROUGH the catalog when
    * enforcement is on: a raw `format("graft").load(path)` carries no
    * table identity to authorize, so it would bypass every grant.
    * Embedded sessions (no Connect holder) are the engine operator's
    * own process and stay unrestricted. (Spark's built-in file
    * formats remain reachable to a remote session — closing that
    * requires filesystem ACLs under the warehouse root, the same
    * stance as Hive/Delta table ACL deployments; documented in
    * SURVEY B52.)
    */
  def guardPathAccess(spark: SparkSession, path: String): Unit = cfg.foreach { c =>
    org.apache.spark.sql.connect.graftglue.ConnectGlue.connectUserOf(spark)
      .orElse(GraftThriftServer.thriftUserOf(spark))
      .filterNot(c.superusers.contains)
      .foreach { p =>
        GraftAudit.record(p, "PATH", path, "deny")
        throw new AccessDenied(
          s"PERMISSION_DENIED: principal '$p' may not open graft paths directly " +
            s"($path); access tables through the catalog")
      }
  }
}

/** Resolves the acting principal for a session. Connect sessions map
  * back to their session holder's (authentication-bound) userId; an
  * embedded session is owned by whoever constructed it, so the conf /
  * process user is authoritative there.
  */
object GraftAuthIdentity {

  def current(spark: SparkSession): String =
    connectUser(spark)
      // Thrift-owned sessions resolve their SASL-verified login BEFORE
      // the conf fallback: the JDBC URL's conf segment is
      // client-controlled, so a conf-first order would let any
      // authenticated tenant impersonate any principal with
      // `?spark.graft.sql.user=victim`.
      .orElse(GraftThriftServer.thriftUserOf(spark))
      .orElse(spark.conf.getOption("spark.graft.sql.user"))
      .getOrElse(spark.sparkContext.sparkUser)

  /** The Connect session-holder userId for `spark`, if this session IS
    * a Connect-spawned one (resolved through the ConnectGlue shim —
    * the service's session registry is private[connect]).
    */
  private def connectUser(spark: SparkSession): Option[String] =
    org.apache.spark.sql.connect.graftglue.ConnectGlue.connectUserOf(spark)
}
