package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftAuthz semantics, unit-level (the wire-level tenant isolation
  * is ConnectGatewaySpec's authorization case): privilege ordering,
  * namespace-level coverage, embedded-principal resolution via the
  * `spark.graft.sql.user` conf, and revocation through the cache.
  */
class AuthzSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def as[A](user: String)(body: => A): A = {
    spark.conf.set("spark.graft.sql.user", user)
    try body finally spark.conf.unset("spark.graft.sql.user")
  }

  test("privilege hierarchy, namespace coverage, and revocation") {
    val url = "jdbc:derby:memory:authzunit;create=true"
    GraftAuthz.enable(url, superusers = Set("root_admin"))
    try {
      // MODIFY implies SELECT; SELECT does not imply MODIFY.
      GraftAuthz.grant("u1", "db1.t1", "MODIFY")
      as("u1") {
        GraftAuthz.requireSelect(spark, "db1", "t1")
        GraftAuthz.requireModify(spark, "db1", "t1")
        assert(GraftAuthz.mayModify(spark, "db1", "t1"))
      }
      GraftAuthz.grant("u2", "db1.t1", "SELECT")
      as("u2") {
        GraftAuthz.requireSelect(spark, "db1", "t1")
        assert(!GraftAuthz.mayModify(spark, "db1", "t1"))
        val e = intercept[GraftAuthz.AccessDenied] {
          GraftAuthz.requireModify(spark, "db1", "t1")
        }
        assert(e.getMessage.contains("PERMISSION_DENIED"))
      }

      // A namespace grant covers every table inside it — and only it.
      GraftAuthz.grant("u3", "db2", "ALL")
      as("u3") {
        GraftAuthz.requireModify(spark, "db2", "anything")
        GraftAuthz.requireGrantAuthority(spark, "db2.anything")
        intercept[GraftAuthz.AccessDenied] {
          GraftAuthz.requireSelect(spark, "db1", "t1")
        }
      }

      // Superusers bypass; unknown principals are denied everything.
      as("root_admin") { GraftAuthz.requireModify(spark, "db1", "t1") }
      as("nobody") {
        intercept[GraftAuthz.AccessDenied] {
          GraftAuthz.requireSelect(spark, "db1", "t1")
        }
      }

      // Revocation takes effect (same-JVM cache clears on mutation).
      GraftAuthz.revoke("u2", "db1.t1", "SELECT")
      as("u2") {
        intercept[GraftAuthz.AccessDenied] {
          GraftAuthz.requireSelect(spark, "db1", "t1")
        }
      }

      // Grant authority requires ALL: MODIFY is not enough to delegate.
      as("u1") {
        intercept[GraftAuthz.AccessDenied] {
          GraftAuthz.requireGrantAuthority(spark, "db1.t1")
        }
      }

      // show_grants reflects the surviving direct grants.
      assert(GraftAuthz.grants("db1.t1").toSet == Set("u1" -> "MODIFY"))
    } finally GraftAuthz.disable()
  }

  test("audit trail records allow/deny decisions and grant administration") {
    val url = "jdbc:derby:memory:auditunit;create=true"
    GraftAuthz.enable(url, superusers = Set("root_admin"))
    try {
      GraftAuthz.grant("au1", "adb.t", "SELECT")
      as("au1") { GraftAuthz.requireSelect(spark, "adb", "t") }
      as("au2") {
        intercept[GraftAuthz.AccessDenied] { GraftAuthz.requireSelect(spark, "adb", "t") }
      }
      GraftAuthz.revoke("au1", "adb.t", "SELECT")
      GraftAudit.flush()
      val entries = GraftAudit.tail(100)
      def has(p: String, verb: String, sec: String, dec: String): Boolean =
        entries.exists(e => e.principal == p && e.verb == verb &&
          e.securable == sec && e.decision == dec)
      assert(has("au1", "SELECT", "adb.t", "allow"), entries.mkString(";"))
      assert(has("au2", "SELECT", "adb.t", "deny"), entries.mkString(";"))
      assert(has("au1", "GRANT SELECT", "adb.t", "admin"), entries.mkString(";"))
      assert(has("au1", "REVOKE SELECT", "adb.t", "admin"), entries.mkString(";"))
      assert(GraftAudit.dropped == 0L)
      // newest-first ordering: the revoke is the latest adb.t admin row
      val admins = entries.filter(_.decision == "admin")
      assert(admins.head.verb.startsWith("REVOKE"), admins.mkString(";"))

      // the audit reader bar is grant authority: a plain principal
      // cannot read the trail through the procedure's check
      as("au1") {
        intercept[GraftAuthz.AccessDenied] { GraftAuthz.requireGrantAuthority(spark, "*") }
      }
      as("root_admin") { GraftAuthz.requireGrantAuthority(spark, "*") }

      // SQL surface: CALL system.show_audit serves the trail to admins
      as("root_admin") {
        val rows = spark.sql("CALL graft_cat.system.show_audit(5)").collect()
        assert(rows.nonEmpty && rows.forall(_.getString(4).nonEmpty))
      }
    } finally GraftAuthz.disable()
  }

  test("row filters and column masks restrict reads per principal and freeze writes") {
    val url = "jdbc:derby:memory:rowpol;create=true"
    // The embedded test session is the operator: superuser, stages data.
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.pol")
      spark.sql("DROP TABLE IF EXISTS graft_cat.pol.t")
      spark.sql("""CREATE TABLE graft_cat.pol.t AS
        SELECT id AS k, id % 3 AS g, CAST(id * 100 AS DOUBLE) AS secret FROM range(30)""")
      GraftAuthz.grant("u1", "pol.t", "SELECT")
      GraftAuthz.grant("u9", "pol.t", "SELECT")
      GraftAuthz.setRowFilter("u1", "pol.t", "g = 1")
      GraftAuthz.setColumnMask("u1", "pol.t", "secret", "CAST(-1 AS DOUBLE)")

      // u1 sees only its rows, with the masked column substituted —
      // through plain reads, aggregates and joins alike.
      as("u1") {
        val rows = spark.sql("SELECT k, g, secret FROM graft_cat.pol.t").collect()
        assert(rows.length == 10, rows.length)
        assert(rows.forall(_.getLong(1) == 1L))
        assert(rows.forall(_.getDouble(2) == -1.0))
        assert(spark.sql(
          "SELECT count(*) AS n FROM graft_cat.pol.t a JOIN graft_cat.pol.t b ON a.k = b.k")
          .collect()(0).getLong(0) == 10L)
        // policies freeze every write surface for the principal
        val e1 = intercept[Exception] {
          spark.sql("UPDATE graft_cat.pol.t SET secret = 0 WHERE k = 1")
        }
        assert(e1.getMessage.contains("PERMISSION_DENIED"), e1.getMessage)
        val e2 = intercept[Exception] {
          spark.sql("INSERT INTO graft_cat.pol.t SELECT 99, 1, 0.0")
        }
        assert(e2.getMessage.contains("PERMISSION_DENIED"), e2.getMessage)
        val e3 = intercept[Exception] {
          spark.sql("DELETE FROM graft_cat.pol.t WHERE k = 4")
        }
        assert(e3.getMessage.contains("PERMISSION_DENIED"), e3.getMessage)
      }

      // A policy-free principal and the superuser see raw data.
      as("u9") {
        val all = spark.sql("SELECT count(*) AS n, max(secret) AS m FROM graft_cat.pol.t")
          .collect()(0)
        assert(all.getLong(0) == 30L && all.getDouble(1) == 2900.0, all)
      }
      assert(spark.sql("SELECT count(*) AS n FROM graft_cat.pol.t")
        .collect()(0).getLong(0) == 30L)

      // Dropping the policies restores the full view.
      GraftAuthz.dropPolicies("u1", "pol.t")
      as("u1") {
        assert(spark.sql("SELECT count(*) AS n FROM graft_cat.pol.t")
          .collect()(0).getLong(0) == 30L)
      }
      spark.sql("DROP TABLE graft_cat.pol.t")
    } finally GraftAuthz.disable()
  }

  test("disabled enforcement is a no-op; enabling requires no pre-existing grants table") {
    // No config: every check passes for anyone (embedded default).
    GraftAuthz.requireSelect(spark, "anyns", "anytable")
    GraftAuthz.requireModify(spark, "anyns", "anytable")
    assert(GraftAuthz.mayModify(spark, "anyns", "anytable"))
    // grant() without enable() is a hard error, not a silent no-op.
    intercept[IllegalStateException] { GraftAuthz.grant("u", "db.t", "ALL") }
  }
}
