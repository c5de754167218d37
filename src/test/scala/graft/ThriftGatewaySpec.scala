package graft

import java.sql.{DriverManager, SQLException}

import org.scalatest.funsuite.AnyFunSuite

/** HiveServer2 Thrift JDBC endpoint — the reference's user-facing SQL
  * port (Kyuubi's Thrift frontend, `kyuubi.frontend.thrift.binary.
  * bind.port: 10009`, reference api/v1alpha1/ninecluster_metadata.go:
  * 23-24): a REAL Hive-JDBC client (the beeline/BI wire) connects,
  * authenticates through the same JDBC credential query as the gRPC
  * gateway (C22, Kyuubi's JDBC-auth contract, kyuubi.go:55-63), runs
  * catalog SQL against graft_cat (SELECT + CALL + time travel), and is
  * subject to engine authorization (C24), audit (C28) and per-principal
  * admission control (C30) — all keyed to the SASL-verified identity,
  * which a client-supplied conf override cannot spoof.
  */
class ThriftGatewaySpec extends AnyFunSuite {
  import SharedSpark.spark

  private val port = 14999

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  test("hive-jdbc: auth, catalog SQL + CALL + time travel, tenant isolation, audit, admission cap") {
    // Credential + grants + audit control plane: one embedded-Derby DB,
    // exactly the shared-store deployment shape.
    val url = "jdbc:derby:memory:thriftauth;create=true"
    val conn0 = DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 's1'), ('bob', 's2')")
    } finally conn0.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?",
      maxConcurrentPerUser = 1)
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    GraftThriftServer.start(spark, port)
    try {
      // Operator stages per-tenant namespaces, a versioned table, grants.
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.th_a")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.th_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.th_a.t")
      spark.sql("CREATE TABLE graft_cat.th_a.t AS SELECT id, id % 3 AS g FROM range(30)")
      spark.sql("INSERT INTO graft_cat.th_a.t SELECT id, CAST(9 AS BIGINT) AS g FROM range(30, 40)")
      spark.sql("DROP TABLE IF EXISTS graft_cat.th_b.secret")
      spark.sql("CREATE TABLE graft_cat.th_b.secret AS SELECT 42 AS answer")
      GraftAuthz.grant("alice", "th_a", "ALL")
      GraftAuthz.grant("bob", "th_b", "ALL")

      Class.forName("org.apache.hive.jdbc.HiveDriver")
      def connect(user: String, pass: String, urlExtra: String = "") =
        DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default$urlExtra", user, pass)

      // C22 on the Thrift leg: a bad token never gets a session.
      val rejected = intercept[SQLException] { connect("alice", "wrong") }
      assert(chain(rejected).mkString.toLowerCase.contains("error validating the login"),
        chain(rejected))

      val alice = connect("alice", "s1")
      try {
        val st = alice.createStatement()

        // Catalog SQL over the wire.
        val rs = st.executeQuery(
          "SELECT g, count(*) AS c FROM graft_cat.th_a.t GROUP BY g ORDER BY g")
        val agg = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getLong(1), r.getLong(2))).toList
        rs.close()
        assert(agg == List((0L, 10L), (1L, 10L), (2L, 10L), (9L, 10L)), agg)

        // Time travel: version 1 (the CTAS data; v0 is the staged
        // empty create) predates the INSERT.
        val tt = st.executeQuery(
          "SELECT count(*) AS c FROM graft_cat.th_a.t VERSION AS OF 1")
        assert(tt.next() && tt.getLong(1) == 30L)
        tt.close()

        // A maintenance procedure CALL on her own table.
        val call = st.executeQuery("CALL graft_cat.system.compact('th_a.t', 1)")
        assert(call.next(), "compact must return the new version")
        call.close()

        // C24 over Thrift: bob's table denies alice...
        val denied = intercept[SQLException] {
          st.executeQuery("SELECT answer FROM graft_cat.th_b.secret")
        }
        assert(chain(denied).mkString.contains("PERMISSION_DENIED"), chain(denied))
        st.close()

        // ...and the denial is in the audit trail (C28), attributed to
        // the SASL identity.
        GraftAudit.flush(5000L)
        val trail = spark.sql("CALL graft_cat.system.show_audit(200)").collect()
        val audited = trail
          .exists(r => r.getString(1) == "alice" && r.getString(4) == "deny" &&
            r.getString(3).contains("th_b"))
        assert(audited, "denied Thrift query must land in the audit trail; got:\n" +
          trail.map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
            .mkString("\n"))
      } finally alice.close()

      // Identity binding: a conf override in the JDBC URL cannot
      // impersonate a superuser or another tenant — the SASL login wins.
      val spoof = connect("alice", "s1",
        s"?spark.graft.sql.user=${spark.sparkContext.sparkUser}")
      try {
        val st = spoof.createStatement()
        val denied = intercept[SQLException] {
          st.executeQuery("SELECT answer FROM graft_cat.th_b.secret")
        }
        assert(chain(denied).mkString.contains("PERMISSION_DENIED"),
          s"spoofed conf must not escalate: ${chain(denied)}")
        st.close()
      } finally spoof.close()

      // C30 on the Thrift leg: with a cap of 1 in-flight execution,
      // a second concurrent statement fails fast (the first statement's
      // operation is still open — hive-jdbc closes it at Statement
      // close), and capacity frees on close.
      val c1 = connect("bob", "s2")
      val c2 = connect("bob", "s2")
      try {
        val st1 = c1.createStatement()
        st1.execute("SELECT id FROM range(5)") // operation held open
        val st2 = c2.createStatement()
        val exhausted = intercept[SQLException] {
          st2.executeQuery("SELECT 1")
        }
        assert(chain(exhausted).mkString.contains("RESOURCE_EXHAUSTED"), chain(exhausted))
        st1.close() // releases the slot
        val rs2 = st2.executeQuery("SELECT 7 AS x")
        assert(rs2.next() && rs2.getInt(1) == 7)
        rs2.close(); st2.close()
      } finally { c1.close(); c2.close() }
    } finally {
      GraftAuthz.disable()
      ConnectAuth.disable()
    }
  }

  test("discovery failover: a lease row carries both ports; a JDBC client re-resolves Thrift") {
    // C26 covers the Thrift wire: the gateway's ONE lease row
    // advertises gRPC and Thrift ports together. A "crashed" peer
    // (direct row, short lease, Thrift port 19999, no heartbeat)
    // lapses; re-resolution lands on this host's live Thrift endpoint
    // and a real hive-jdbc client runs a query against it.
    val url = "jdbc:derby:memory:thriftdisc;create=true"
    GraftThriftServer.start(spark, port) // idempotent with the first test
    val conn0 = DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      // pre-mysql_port schema ON PURPOSE: exercises the ALTER upgrade
      st.execute("CREATE TABLE graft_gateways(host VARCHAR(256), port INTEGER, " +
        "lease_expiry BIGINT, thrift_port INTEGER, PRIMARY KEY (host, port))")
      st.execute("INSERT INTO graft_gateways VALUES " +
        s"('dead-host', 9998, ${System.currentTimeMillis() + 300}, 19999)")
    } finally conn0.close()
    try {
      GatewayDiscovery.register(url,
        GatewayDiscovery.Endpoint("localhost", 15002, thriftPort = Some(port),
          mysqlPort = Some(14997)),
        leaseMillis = 5000L)
      assert(GatewayDiscovery.live(url).map(_.thriftPort).toSet
        == Set(Some(port), Some(19999)))
      Thread.sleep(400) // the dead host's lease lapses
      val resolved = GatewayDiscovery.resolveThrift(url)
      assert(resolved == Some(GatewayDiscovery.Endpoint("localhost", 15002,
        Some(port), Some(14997))), resolved)
      // the same lease row advertises the MySQL wire (C38)
      assert(GatewayDiscovery.resolveMysql(url).flatMap(_.mysqlPort)
        .contains(14997))
      // the re-resolved endpoint actually serves: real hive-jdbc query
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val c = DriverManager.getConnection(
        s"jdbc:hive2://${resolved.get.host}:${resolved.get.thriftPort.get}/default",
        "anyone", "")
      try {
        val rs = c.createStatement().executeQuery("SELECT 40 + 2 AS x")
        assert(rs.next() && rs.getInt(1) == 42)
        rs.close()
      } finally c.close()
    } finally GatewayDiscovery.deregister()
  }
}
