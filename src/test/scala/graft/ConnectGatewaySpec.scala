package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark Connect gateway — the network SQL endpoint the reference
  * platform fronts with Kyuubi (internal/controller/kyuubi.go exposes
  * a Thrift/REST service; charts/nineinfra wires its ports): a gRPC
  * server over the running engine, REMOTE clients executing text SQL
  * against the shared `graft_cat` catalog, per-session state isolated.
  *
  * The client is the distribution's shaded spark-connect-client-jvm
  * jar, driven reflectively through a dedicated URLClassLoader: the
  * client jar bundles its own copy of the sql-api surface, so it is
  * quarantined from the classic-session classpath (jars/connect-repl)
  * exactly as in the Spark distribution; shared leaf types (Row) still
  * resolve parent-first to the test's own classes, so results are
  * asserted on directly.
  */
class ConnectGatewaySpec extends AnyFunSuite {
  import SharedSpark.spark

  private val port = 15999

  private lazy val clientLoader: ClassLoader = {
    val jars = new java.io.File("/opt/spark/jars/connect-repl").listFiles()
      .filter(_.getName.startsWith("spark-connect-client-jvm"))
      .map(_.toURI.toURL)
    assert(jars.nonEmpty, "shaded connect client jar missing from the distribution")
    new java.net.URLClassLoader(jars, getClass.getClassLoader)
  }

  /** A remote Connect session (one per instance — `create()`, never
    * `getOrCreate()`, so two Clients are two server-side sessions).
    * `params` are extra `;key=value` connection-string pairs; the
    * Connect spec sends non-reserved pairs as per-request gRPC
    * metadata (credentials ride there).
    */
  private final class Client(params: String = "") {
    private val module = clientLoader
      .loadClass("org.apache.spark.sql.connect.SparkSession$")
      .getField("MODULE$").get(null)
    private val session = {
      val b = module.getClass.getMethod("builder").invoke(module)
      b.getClass.getMethod("remote", classOf[String])
        .invoke(b, s"sc://localhost:$port/$params")
      b.getClass.getMethod("create").invoke(b)
    }
    def sql(q: String): Seq[org.apache.spark.sql.Row] = {
      val ds = session.getClass.getMethod("sql", classOf[String]).invoke(session, q)
      ds.getClass.getMethod("collect").invoke(ds)
        .asInstanceOf[Array[_]].toSeq.map(_.asInstanceOf[org.apache.spark.sql.Row])
    }
    /** `spark.read.format("graft").load(path).collect()` over the wire. */
    def readGraft(path: String): Seq[org.apache.spark.sql.Row] = {
      val reader = session.getClass.getMethod("read").invoke(session)
      val fmt = reader.getClass.getMethod("format", classOf[String]).invoke(reader, "graft")
      val ds = fmt.getClass.getMethod("load", classOf[String]).invoke(fmt, path)
      ds.getClass.getMethod("collect").invoke(ds)
        .asInstanceOf[Array[_]].toSeq.map(_.asInstanceOf[org.apache.spark.sql.Row])
    }
    def close(): Unit = session.getClass.getMethod("close").invoke(session)
  }

  test("remote clients run SQL against graft_cat; sessions are isolated; queries run concurrently") {
    // Port 15999 is pinned in SharedSpark's static conf (SparkConf is
    // sealed once the context exists).
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      val c1 = new Client
      val c2 = new Client

      // One client creates a lakehouse table through the catalog over
      // the wire; the OTHER reads it back — shared catalog, full DDL +
      // CTAS + query path through the V2 plugin, pure text SQL.
      c1.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw")
      c1.sql("DROP TABLE IF EXISTS graft_cat.gw.t")
      c1.sql("CREATE TABLE graft_cat.gw.t AS SELECT id, id % 3 AS g FROM range(30)")
      val agg = c2.sql(
        "SELECT g, count(*) AS c, sum(id) AS s FROM graft_cat.gw.t GROUP BY g ORDER BY g")
      assert(agg.map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((0L, 10L), (1L, 10L), (2L, 10L)), agg)

      // graft's conf-registered extensions reach the server-side
      // session: a native SQL function resolves over the wire.
      val cs = c1.sql("SELECT round(cosine_sim(array(1.0f,0.0f), array(1.0f,0.0f)), 4) AS s")
      assert(cs.head.getDouble(0) == 1.0, cs)

      // Per-session isolation: c1's temp view is invisible to c2.
      c1.sql("CREATE OR REPLACE TEMP VIEW gw_mine AS SELECT 42 AS x")
      assert(c1.sql("SELECT x FROM gw_mine").head.getInt(0) == 42)
      val denied = intercept[Exception] { c2.sql("SELECT x FROM gw_mine") }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(denied).exists(m =>
        m.contains("gw_mine") || m.contains("TABLE_OR_VIEW_NOT_FOUND")), chain(denied))

      // Two remote sessions issuing queries AT THE SAME TIME both land.
      val results = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val threads = Seq(c1, c2).zipWithIndex.map { case (c, i) =>
        new Thread(() => {
          val n = (i + 1) * 1000
          results.put(i, c.sql(s"SELECT sum(id) AS s FROM range($n)").head.getLong(0))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(results.get(0) == 499500L && results.get(1) == 1999000L, results)

      c1.close(); c2.close()
    } finally org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
  }

  test("gateway authentication: JDBC credential query rejects bad tokens, admits good ones") {
    // Kyuubi-parity auth (reference kyuubi.go:55-63: JDBC
    // authentication with a credential query): credentials live in an
    // embedded-Derby table; every RPC must present graft_user /
    // graft_token metadata satisfying the two-placeholder query.
    val url = "jdbc:derby:memory:gwauth"
    val conn = java.sql.DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 'secret1')")
    } finally conn.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?")
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // Rejected clients must still be close()d: a lingering Connect
    // client session registers itself as the JVM-wide default
    // SparkSession and would shadow the classic engine session for
    // later suites.
    def expectUnauthenticated(params: String): Unit = {
      val c = new Client(params)
      try {
        val e = intercept[Exception] { c.sql("SELECT 1 AS x") }
        assert(chain(e).exists(_.contains("UNAUTHENTICATED")), chain(e))
      } finally { try c.close() catch { case _: Throwable => () } }
    }
    try {
      // Valid credentials: full SQL surface works. The connection's
      // user_id must MATCH the authenticated user (identity binding —
      // the GraftAuthz trust chain); a bare authenticated client that
      // claims a different user_id is exercised below.
      val good = new Client(";user_id=alice;graft_user=alice;graft_token=secret1")
      assert(good.sql("SELECT 41 + 1 AS x").head.getInt(0) == 42)
      good.close()

      expectUnauthenticated(";graft_user=alice;graft_token=wrong") // wrong token
      expectUnauthenticated("") // no credentials at all
      expectUnauthenticated(";graft_user=mallory;graft_token=secret1") // unknown user
      // Authenticated but claiming someone else's identity: the
      // request-level binding rejects it (PERMISSION_DENIED, not
      // UNAUTHENTICATED — the credentials themselves are valid).
      val spoof = new Client(";user_id=bob;graft_user=alice;graft_token=secret1")
      try {
        val e = intercept[Exception] { spoof.sql("SELECT 1 AS x") }
        assert(chain(e).exists(_.contains("does not match")), chain(e))
      } finally { try spoof.close() catch { case _: Throwable => () } }
    } finally {
      ConnectAuth.disable()
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }

  test("admission control: one tenant's concurrency cap never touches another's capacity") {
    // Kyuubi-parity operation limits: with maxConcurrentPerUser=1, a
    // tenant's second in-flight ExecutePlan fails fast with
    // RESOURCE_EXHAUSTED while a DIFFERENT tenant executes freely;
    // once the first execution drains, the tenant is admitted again.
    val url = "jdbc:derby:memory:gwlimit"
    val conn = java.sql.DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 's1'), ('bob', 's2')")
    } finally conn.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?",
      maxConcurrentPerUser = 1)
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    try {
      val alice1 = new Client(";user_id=alice;graft_user=alice;graft_token=s1")
      val alice2 = new Client(";user_id=alice;graft_user=alice;graft_token=s1")
      val bob = new Client(";user_id=bob;graft_user=bob;graft_token=s2")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      // a long-running execution holds alice's single slot…
      val slow = Future {
        alice1.sql("SELECT java_method('java.lang.Thread', 'sleep', 4000L) AS z")
      }
      Thread.sleep(1200) // let it reach the server and start executing
      assert(ConnectAuth.inFlightOf("alice") >= 1)
      // …so alice's second execution is rejected, fast
      val e = intercept[Exception] { alice2.sql("SELECT 1 AS x") }
      assert(chain(e).exists(_.contains("RESOURCE_EXHAUSTED")), chain(e))
      // bob is a different principal: full capacity
      assert(bob.sql("SELECT 2 + 2 AS x").head.getInt(0) == 4)
      Await.result(slow, 30.seconds)
      // slot drained: alice executes again (bounded retry — release
      // rides the gRPC completion callback)
      val deadline = System.currentTimeMillis() + 10000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        try { alice2.sql("SELECT 3 AS x"); ok = true }
        catch { case _: Exception => Thread.sleep(200) }
      }
      assert(ok, "alice never readmitted after her execution drained")
      alice1.close(); alice2.close(); bob.close()
    } finally {
      ConnectAuth.disable()
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }

  test("gateway restart: clients reconnect after stop/start and committed state survives") {
    // The single-process analogue of Kyuubi's ZooKeeper failover
    // (reference kyuubi.go:77-80): the gateway process is stateless —
    // durable state lives in LakeTable commit logs (and stream
    // checkpoints, exactly-once-pinned by the stream_append_once
    // spec), so a restarted endpoint serves the same catalog and a
    // client simply reconnects.
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    val before = new Client
    before.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw")
    before.sql("DROP TABLE IF EXISTS graft_cat.gw.ha")
    before.sql("CREATE TABLE graft_cat.gw.ha AS SELECT id FROM range(100)")
    before.sql("INSERT INTO graft_cat.gw.ha SELECT id FROM range(100, 150)")
    before.close()
    // Gateway goes down (in-flight sessions die with it)…
    org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    // …and comes back. A NEW client connects and reads the committed
    // table — both commits (CTAS + INSERT) intact, versions readable.
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      val after = new Client
      assert(after.sql("SELECT count(*) AS n FROM graft_cat.gw.ha").head.getLong(0) == 150L)
      assert(after.sql(
        "SELECT count(*) AS n FROM graft_history('gw.ha')").head.getLong(0) >= 2L)
      after.close()
    } finally org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
  }

  test("remote row-level DML: UPDATE, MERGE INTO, and TRUNCATE run over the wire") {
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      val c = new Client
      // The conf-injected extensions must carry GraftRowLevelSql into
      // the Connect-spawned session — a remote tenant's UPDATE/MERGE
      // is the Kyuubi-parity DML path.
      c.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw")
      c.sql("DROP TABLE IF EXISTS graft_cat.gw.dml")
      c.sql("CREATE TABLE graft_cat.gw.dml AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(10)")
      c.sql("UPDATE graft_cat.gw.dml SET v = v + 100 WHERE k >= 5")
      val afterUpd = c.sql("SELECT round(sum(v), 1) AS s FROM graft_cat.gw.dml")
      assert(afterUpd.head.getDouble(0) == 545.0, afterUpd) // 0..9 + 5*100
      c.sql("""MERGE INTO graft_cat.gw.dml AS t
              |USING (SELECT 3 AS k, 0.0 AS v UNION ALL SELECT 20, 20.0) AS s
              |ON t.k = s.k
              |WHEN MATCHED THEN DELETE
              |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
      val afterMerge = c.sql(
        "SELECT count(*) AS n, round(sum(v), 1) AS s FROM graft_cat.gw.dml")
      assert(afterMerge.head.getLong(0) == 10L, afterMerge) // −k=3, +k=20
      assert(afterMerge.head.getDouble(1) == 545.0 - 3.0 + 20.0, afterMerge)
      // TRUNCATE rides SupportsDeleteV2's default (deleteWhere(true)).
      c.sql("TRUNCATE TABLE graft_cat.gw.dml")
      assert(c.sql("SELECT count(*) AS n FROM graft_cat.gw.dml").head.getLong(0) == 0L)
      c.close()
    } finally org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
  }

  test("remote table lifecycle: CALL procedures, DV-mode DML, views, tags over the wire") {
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      val c = new Client
      c.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw")
      c.sql("DROP TABLE IF EXISTS graft_cat.gw.life")
      c.sql("DROP TABLE IF EXISTS graft_cat.gw.life_v")
      c.sql("CREATE TABLE graft_cat.gw.life AS SELECT id AS k, CAST(id AS DOUBLE) AS v FROM range(100)")
      // maintenance procedure round trip (result row comes back)
      val ver = c.sql("CALL graft_cat.system.compact('gw.life', 1)")
      assert(ver.head.getLong(0) >= 1L, ver)
      // DV-mode DELETE from a remote tenant: merge-on-read, no rewrite
      c.sql("CALL graft_cat.system.enable_dv('gw.life', true)")
      c.sql("DELETE FROM graft_cat.gw.life WHERE k < 50")
      assert(c.sql("SELECT count(*) AS n FROM graft_cat.gw.life").head.getLong(0) == 50L)
      // view created remotely, queried remotely
      c.sql("CALL graft_cat.system.create_view('gw.life_v', 'SELECT count(*) AS n FROM graft_cat.gw.life', true)")
      assert(c.sql("SELECT * FROM graft_cat.gw.life_v").head.getLong(0) == 50L)
      // tag + time travel by name, remotely
      c.sql("CALL graft_cat.system.tag('gw.life', 'before_delete', 1)")
      assert(c.sql("SELECT count(*) AS n FROM graft_cat.gw.life VERSION AS OF 'before_delete'")
        .head.getLong(0) == 100L)
      c.close()
    } finally org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
  }

  test("gateway discovery: lease-table registration, expiry, and client resolution") {
    // The zookeeper.go analogue (kyuubi.go:77-80) on the control-plane
    // JDBC DB: hosts heartbeat leases, clients resolve a live endpoint,
    // a crashed host's row lapses and is reaped.
    val url = "jdbc:derby:memory:gwdisc;create=true"
    // A "crashed" host: row written directly with a short lease and no
    // heartbeat behind it.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE graft_gateways(host VARCHAR(256), port INTEGER, " +
        "lease_expiry BIGINT, PRIMARY KEY (host, port))")
      st.execute(s"INSERT INTO graft_gateways VALUES " +
        s"('dead-host', 9999, ${System.currentTimeMillis() + 300})")
    } finally conn.close()
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      // The live gateway registers itself (the real Connect port).
      GatewayDiscovery.register(url, GatewayDiscovery.Endpoint("localhost", port),
        leaseMillis = 2000L)
      val both = GatewayDiscovery.live(url)
      assert(both.map(_.port).toSet == Set(port, 9999), both)
      // The dead host's lease lapses; resolution reaps it and returns
      // the surviving gateway, which a client then actually uses.
      Thread.sleep(400)
      val resolved = GatewayDiscovery.resolve(url)
      assert(resolved.contains(GatewayDiscovery.Endpoint("localhost", port)), resolved)
      assert(GatewayDiscovery.live(url).map(_.port) == Seq(port))
      val c = new Client() // connects to the resolved host:port
      assert(c.sql(s"SELECT 2 + 2 AS x").head.getInt(0) == 4)
      c.close()
      // Heartbeats outlive one lease interval (the thread is beating).
      Thread.sleep(2500)
      assert(GatewayDiscovery.live(url).map(_.port) == Seq(port), "heartbeat must renew")
      // Graceful shutdown removes the row immediately.
      GatewayDiscovery.deregister()
      assert(GatewayDiscovery.live(url).isEmpty)
    } finally {
      GatewayDiscovery.deregister()
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }

  test("engine-level authorization: grants isolate tenants; identities cannot be spoofed") {
    // Authentication says WHO is calling (C22); GraftAuthz says what
    // they may TOUCH — table/namespace grants in the same Derby store
    // as the credential table, enforced inside the engine's catalog
    // against the interceptor-bound identity.
    val url = "jdbc:derby:memory:gwauthz;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 's1'), ('bob', 's2')")
    } finally conn.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?")
    // The embedded test session is the engine operator: superuser.
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    def denied(body: => Any): Unit = {
      val e = intercept[Exception] { body }
      assert(chain(e).exists(_.contains("PERMISSION_DENIED")), chain(e))
    }
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    try {
      // Operator stages per-tenant namespaces and grants.
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw_a")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.gw_b")
      GraftAuthz.grant("alice", "gw_a", "ALL")
      GraftAuthz.grant("bob", "gw_b", "ALL")

      val a = new Client(";user_id=alice;graft_user=alice;graft_token=s1")
      val b = new Client(";user_id=bob;graft_user=bob;graft_token=s2")

      // Each tenant works freely inside their own namespace.
      a.sql("DROP TABLE IF EXISTS graft_cat.gw_a.t")
      a.sql("CREATE TABLE graft_cat.gw_a.t AS SELECT id, id % 3 AS g FROM range(30)")
      b.sql("DROP TABLE IF EXISTS graft_cat.gw_b.t")
      b.sql("CREATE TABLE graft_cat.gw_b.t AS SELECT id, CAST(id AS DOUBLE) AS v FROM range(50)")
      assert(a.sql("SELECT count(*) AS n FROM graft_cat.gw_a.t").head.getLong(0) == 30L)

      // Tenant A cannot SELECT, DROP, mutate, or maintain tenant B's
      // table — and B keeps serving its own queries throughout.
      denied { a.sql("SELECT count(*) AS n FROM graft_cat.gw_b.t") }
      denied { a.sql("DROP TABLE graft_cat.gw_b.t") }
      denied { a.sql("INSERT INTO graft_cat.gw_b.t SELECT 99, 99.0") }
      denied { a.sql("CALL graft_cat.system.compact('gw_b.t', 1)") }
      denied { a.sql("CREATE TABLE graft_cat.gw_b.evil AS SELECT 1 AS x") }
      assert(b.sql("SELECT count(*) AS n FROM graft_cat.gw_b.t").head.getLong(0) == 50L)

      // SELECT-only grant: reads open up, every write stays shut —
      // including UPDATE/MERGE (the row-level rule path) and TRUNCATE.
      GraftAuthz.grant("alice", "gw_b.t", "SELECT")
      assert(a.sql("SELECT count(*) AS n FROM graft_cat.gw_b.t").head.getLong(0) == 50L)
      denied { a.sql("INSERT INTO graft_cat.gw_b.t SELECT 99, 99.0") }
      denied { a.sql("UPDATE graft_cat.gw_b.t SET v = 0 WHERE id = 1") }
      denied { a.sql("DELETE FROM graft_cat.gw_b.t WHERE id = 1") }
      denied { a.sql("TRUNCATE TABLE graft_cat.gw_b.t") }
      // Row policies ride the same identity chain over the wire: with
      // a filter and mask set for alice, her remote reads shrink and
      // redact while bob's stay raw.
      GraftAuthz.setRowFilter("alice", "gw_b.t", "id < 10")
      GraftAuthz.setColumnMask("alice", "gw_b.t", "v", "CAST(0 AS DOUBLE)")
      val masked = a.sql("SELECT count(*) AS n, max(v) AS m FROM graft_cat.gw_b.t").head
      assert(masked.getLong(0) == 10L && masked.getDouble(1) == 0.0, masked)
      assert(b.sql("SELECT count(*) AS n, max(v) AS m FROM graft_cat.gw_b.t")
        .head.getLong(0) == 50L)
      GraftAuthz.dropPolicies("alice", "gw_b.t")

      GraftAuthz.revoke("alice", "gw_b.t", "SELECT")
      denied { a.sql("SELECT count(*) AS n FROM graft_cat.gw_b.t") }

      // SQL-reachable grant management: ALL on a securable carries the
      // authority to delegate it — and nothing beyond it (a tenant
      // cannot grant themselves into someone else's namespace).
      assert(a.sql("CALL graft_cat.system.grant('carol', 'gw_a.t', 'SELECT')")
        .head.getBoolean(0))
      val g = a.sql("CALL graft_cat.system.show_grants('gw_a.t')").head.getString(0)
      assert(g.contains("carol:SELECT"), g)
      denied { a.sql("CALL graft_cat.system.grant('alice', 'gw_b.t', 'ALL')") }
      assert(a.sql("CALL graft_cat.system.revoke('carol', 'gw_a.t', 'SELECT')")
        .head.getBoolean(0))
      assert(!a.sql("CALL graft_cat.system.show_grants('gw_a.t')")
        .head.getString(0).contains("carol"), "revoke must take effect")

      // Path-based bypass: a remote tenant may not open graft paths
      // around the catalog's grants (DataFrame reader surface).
      denied { a.readGraft(s"${GraftSession.catalogRoot}/gw_b/t") }

      // Metadata/CDC table functions expose row data (change feeds
      // carry full images): same SELECT gate as a direct read, and
      // raw-path targets stay closed to remote tenants.
      denied { a.sql("SELECT * FROM graft_history('gw_b.t')") }
      denied { a.sql("SELECT * FROM graft_changes('gw_b.t')") }
      denied { a.sql(s"SELECT * FROM graft_history('${GraftSession.catalogRoot}/gw_b/t')") }
      assert(b.sql("SELECT count(*) AS n FROM graft_history('gw_b.t')")
        .head.getLong(0) >= 1L) // the owner still reads their own history

      // Spoofing: presenting alice's valid credentials while claiming
      // bob's user_id is rejected at the transport before any handler.
      val mallory = new Client(";user_id=bob;graft_user=alice;graft_token=s1")
      val e = intercept[Exception] { mallory.sql("SELECT 1 AS x") }
      assert(chain(e).exists(m => m.contains("PERMISSION_DENIED") ||
        m.contains("does not match")), chain(e))
      try mallory.close() catch { case _: Throwable => () }

      // The tenants' own service is unaffected by the denials above.
      assert(b.sql("SELECT count(*) AS n FROM graft_cat.gw_b.t").head.getLong(0) == 50L)
      a.close(); b.close()
      // Operator (superuser) cleanup passes every check.
      spark.sql("DROP TABLE IF EXISTS graft_cat.gw_a.t")
      spark.sql("DROP TABLE IF EXISTS graft_cat.gw_b.t")
    } finally {
      GraftAuthz.disable()
      ConnectAuth.disable()
      org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }
}
