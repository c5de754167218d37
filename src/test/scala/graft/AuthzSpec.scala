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

  test("disabled enforcement is a no-op; enabling requires no pre-existing grants table") {
    // No config: every check passes for anyone (embedded default).
    GraftAuthz.requireSelect(spark, "anyns", "anytable")
    GraftAuthz.requireModify(spark, "anyns", "anytable")
    assert(GraftAuthz.mayModify(spark, "anyns", "anytable"))
    // grant() without enable() is a hard error, not a silent no-op.
    intercept[IllegalStateException] { GraftAuthz.grant("u", "db.t", "ALL") }
  }
}
