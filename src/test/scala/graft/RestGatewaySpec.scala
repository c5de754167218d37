package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s.{JArray, JBool, JNull, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** REST SQL endpoint (the reference's Kyuubi REST frontend — enabled
  * in its default deployment alongside Thrift,
  * api/v1alpha1/ninecluster_metadata.go `kyuubi.frontend.protocols =
  * "REST,THRIFT_BINARY"`). Driven with the JDK HTTP client: Basic
  * auth through the shared credential table, session/statement
  * lifecycle, paged rowsets, JSON NULLs, cross-tenant denial + audit,
  * identity pinning, handle ownership, and the per-principal
  * admission gate.
  */
class RestGatewaySpec extends AnyFunSuite {
  import SharedSpark.spark

  // Ephemeral ports: a fixed port collides with TIME_WAIT conns left
  // by an earlier run of this same spec (observed in-suite).
  private def base = s"http://localhost:${GraftRestServer.boundPort.get}/api/v1"
  private val http = HttpClient.newHttpClient()

  private def basic(user: String, tok: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(s"$user:$tok".getBytes(UTF_8))

  private def call(method: String, path: String, auth: String,
      body: Option[String] = None): (Int, JValue) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .header("Authorization", auth)
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body.getOrElse("{}")))
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(),
      if (resp.body().trim.isEmpty) JNull else JsonMethods.parse(resp.body()))
  }

  private def str(v: JValue, name: String): String = v match {
    case JObject(fs) => fs.collectFirst { case (`name`, JString(s)) => s }.getOrElse(
      fail(s"no string field $name in $v"))
    case _ => fail(s"not an object: $v")
  }

  private def rows(v: JValue): Seq[Seq[Option[String]]] = v match {
    case JObject(fs) => fs.collectFirst { case ("rows", JArray(rs)) =>
      rs.map {
        case JArray(cells) => cells.map {
          case JString(s) => Some(s)
          case JNull => None
          case other => fail(s"unexpected cell $other")
        }
        case other => fail(s"unexpected row $other")
      }
    }.getOrElse(fail(s"no rows in $v"))
    case _ => fail(s"not an object: $v")
  }

  private def hasMore(v: JValue): Boolean = v match {
    case JObject(fs) => fs.collectFirst { case ("hasMoreRows", JBool(b)) => b }
      .getOrElse(fail(s"no hasMoreRows in $v"))
    case _ => fail(s"not an object: $v")
  }

  test("rest wire: auth, statement lifecycle, paging, tenant isolation, admission") {
    val url = "jdbc:derby:memory:restauth;create=true"
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 'r1'), ('bob', 'r2')")
    } finally conn0.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?",
      maxConcurrentPerUser = 2)
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    GraftRestServer.start(spark, 0)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rest_a")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rest_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.rest_a.sales")
      spark.sql("CREATE TABLE graft_cat.rest_a.sales AS " +
        "SELECT id % 3 AS g, id AS v FROM range(30)")
      spark.sql("DROP TABLE IF EXISTS graft_cat.rest_b.secret")
      spark.sql("CREATE TABLE graft_cat.rest_b.secret AS SELECT 42 AS answer")
      GraftAuthz.grant("alice", "rest_a", "ALL")
      GraftAuthz.grant("bob", "rest_b", "ALL")

      // bad token → 401 + WWW-Authenticate, LOGIN denial audited
      val (badCode, _) = call("POST", "/sessions", basic("alice", "wrong"))
      assert(badCode == 401)

      // open a session; the identity-override attempt in configs is
      // ignored (the wire owns the principal, C24)
      val (sc, sessJ) = call("POST", "/sessions", basic("alice", "r1"),
        Some("""{"configs":{"spark.graft.sql.user":"bob"}}"""))
      assert(sc == 200, sessJ)
      val sid = str(sessJ, "identifier")

      // grouped aggregate through the engine catalog
      val (oc, opJ) = call("POST", s"/sessions/$sid/operations/statement",
        basic("alice", "r1"),
        Some("""{"statement":"SELECT g, count(*) AS c, sum(v) AS s FROM graft_cat.rest_a.sales GROUP BY g ORDER BY g"}"""))
      assert(oc == 200, opJ)
      val op1 = str(opJ, "identifier")
      val (_, ev) = call("GET", s"/operations/$op1/event", basic("alice", "r1"))
      assert(str(ev, "state") == "FINISHED", ev)
      val (_, meta) = call("GET", s"/operations/$op1/resultsetmetadata",
        basic("alice", "r1"))
      val colNames = meta match {
        case JObject(fs) => fs.collectFirst { case ("columns", JArray(cs)) =>
          cs.map(c => str(c, "name")) }.get
        case _ => fail(s"bad meta $meta")
      }
      assert(colNames == Seq("g", "c", "s"), colNames)
      // paged fetch: 2 + rest
      val (_, page1) = call("GET", s"/operations/$op1/rowset?maxrows=2",
        basic("alice", "r1"))
      assert(rows(page1).size == 2 && hasMore(page1), page1)
      val (_, page2) = call("GET", s"/operations/$op1/rowset?maxrows=100",
        basic("alice", "r1"))
      assert(!hasMore(page2), page2)
      assert((rows(page1) ++ rows(page2)) == Seq(
        Seq(Some("0"), Some("10"), Some("135")),
        Seq(Some("1"), Some("10"), Some("145")),
        Seq(Some("2"), Some("10"), Some("155"))))

      // bob cannot touch alice's handles — a handle is not a capability
      val (fc, _) = call("GET", s"/operations/$op1/event", basic("bob", "r2"))
      assert(fc == 403)

      // NULL travels as JSON null
      val (_, nOp) = call("POST", s"/sessions/$sid/operations/statement",
        basic("alice", "r1"),
        Some("""{"statement":"SELECT CAST(NULL AS BIGINT) AS n, 7 AS x"}"""))
      val opN = str(nOp, "identifier")
      val (_, nRows) = call("GET", s"/operations/$opN/rowset", basic("alice", "r1"))
      assert(rows(nRows) == Seq(Seq(None, Some("7"))), nRows)

      // identity stayed pinned: alice cannot read bob's table, the
      // denial lands in the op state AND the audit trail
      val (_, dOp) = call("POST", s"/sessions/$sid/operations/statement",
        basic("alice", "r1"),
        Some("""{"statement":"SELECT * FROM graft_cat.rest_b.secret"}"""))
      val opD = str(dOp, "identifier")
      val (_, dEv) = call("GET", s"/operations/$opD/event", basic("alice", "r1"))
      assert(str(dEv, "state") == "ERROR", dEv)
      assert(str(dEv, "exception").contains("PERMISSION_DENIED"), dEv)
      GraftAudit.flush(5000L)
      val trail = spark.sql("CALL graft_cat.system.show_audit(200)").collect()
      assert(trail.exists(r => r.getString(1) == "alice" &&
        r.getString(4) == "deny" && r.getString(3).contains("rest_b")),
        "denied rest-wire query must land in the audit trail")

      // admission (C30): op1/opN are drained (permits released), opD
      // errored (released) — open TWO fresh undrained statements to
      // fill the cap, a third is refused, closing one readmits
      def openStmt(): (Int, JValue) =
        call("POST", s"/sessions/$sid/operations/statement", basic("alice", "r1"),
          Some("""{"statement":"SELECT v FROM graft_cat.rest_a.sales"}"""))
      val (a1, h1) = openStmt(); assert(a1 == 200)
      val (a2, _) = openStmt(); assert(a2 == 200)
      val (a3, deniedJ) = openStmt()
      assert(a3 == 429, deniedJ)
      assert(str(deniedJ, "message").contains("RESOURCE_EXHAUSTED"), deniedJ)
      val (cc, _) = call("DELETE", s"/operations/${str(h1, "identifier")}",
        basic("alice", "r1"))
      assert(cc == 200)
      val (a4, _) = openStmt(); assert(a4 == 200)

      // session close releases everything still open
      val (dc, _) = call("DELETE", s"/sessions/$sid", basic("alice", "r1"))
      assert(dc == 200)
      val (a5, s5) = call("POST", s"/sessions/$sid/operations/statement",
        basic("alice", "r1"), Some("""{"statement":"SELECT 1"}"""))
      assert(a5 == 404, s5)
    } finally {
      GraftRestServer.stop()
      GraftAuthz.disable()
      ConnectAuth.disable()
    }
  }

  test("rest sessions are isolated: one tenant's temp view is invisible to another") {
    GraftRestServer.stop()
    GraftRestServer.start(spark, 0)
    try {
      val auth = basic("anyone", "x") // auth not enforced in this test
      val (c1, s1J) = call("POST", "/sessions", auth); assert(c1 == 200)
      val (c2, s2J) = call("POST", "/sessions", auth); assert(c2 == 200)
      val sid1 = str(s1J, "identifier"); val sid2 = str(s2J, "identifier")
      // session 1 creates a temp view...
      val (v1, _) = call("POST", s"/sessions/$sid1/operations/statement", auth,
        Some("""{"statement":"CREATE OR REPLACE TEMP VIEW rest_tmp AS SELECT 41 AS x"}"""))
      assert(v1 == 200)
      val (q1, o1) = call("POST", s"/sessions/$sid1/operations/statement", auth,
        Some("""{"statement":"SELECT x FROM rest_tmp"}"""))
      assert(q1 == 200)
      val (_, r1) = call("GET", s"/operations/${str(o1, "identifier")}/rowset", auth)
      assert(rows(r1) == Seq(Seq(Some("41"))), r1)
      // ...which session 2 cannot see (newSession per REST session)
      val (q2, o2) = call("POST", s"/sessions/$sid2/operations/statement", auth,
        Some("""{"statement":"SELECT x FROM rest_tmp"}"""))
      assert(q2 == 200)
      val (_, ev2) = call("GET", s"/operations/${str(o2, "identifier")}/event", auth)
      assert(str(ev2, "state") == "ERROR", ev2)
      call("DELETE", s"/sessions/$sid1", auth)
      call("DELETE", s"/sessions/$sid2", auth)
    } finally GraftRestServer.stop()
  }

  test("concurrent rowset fetches on one operation partition rows exactly") {
    GraftRestServer.stop()
    GraftRestServer.start(spark, 0)
    try {
      val auth = basic("anyone", "x")
      val (_, sJ) = call("POST", "/sessions", auth)
      val sid = str(sJ, "identifier")
      val (_, oJ) = call("POST", s"/sessions/$sid/operations/statement", auth,
        Some("""{"statement":"SELECT id FROM range(500) ORDER BY id"}"""))
      val op = str(oJ, "identifier")
      // 4 clients page the same operation concurrently: pages may
      // interleave in any order, but every row arrives exactly once
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val all = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val futs = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            var more = true
            while (more) {
              val (_, page) = RestGatewaySpec.this.call("GET",
                s"/operations/$op/rowset?maxrows=17", auth)
              rows(page).foreach(r => all.add(r.head.get))
              more = hasMore(page)
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      val got = all.asScala.map(_.toLong).sorted.toSeq
      assert(got == (0L until 500L), s"${got.size} rows, " +
        s"dups=${got.groupBy(identity).count(_._2.size > 1)}")
      call("DELETE", s"/sessions/$sid", auth)
    } finally GraftRestServer.stop()
  }

  test("rest wire reaps idle sessions: abandoned clients leak nothing") {
    GraftRestServer.stop()
    GraftRestServer.start(spark, 0, sessionIdleTimeoutMs = 300L)
    try {
      val auth = basic("anyone", "x") // auth not enforced in this test
      val (sc, sessJ) = call("POST", "/sessions", auth)
      assert(sc == 200)
      val sid = str(sessJ, "identifier")
      // active use keeps it alive...
      val (oc, _) = call("POST", s"/sessions/$sid/operations/statement", auth,
        Some("""{"statement":"SELECT 1 AS one"}"""))
      assert(oc == 200)
      // ...but an abandoned session is reaped once idle past the
      // timeout (janitor ticks every ~1s at this timeout)
      Thread.sleep(2500L)
      val (gone, _) = call("POST", s"/sessions/$sid/operations/statement", auth,
        Some("""{"statement":"SELECT 1"}"""))
      assert(gone == 404, s"idle session should be reaped, got $gone")
    } finally GraftRestServer.stop()
  }

  private def put(path: String, auth: String, body: String,
      headers: Map[String, String]): (Int, JValue) = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
      .header("Authorization", auth)
      .PUT(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(),
      if (resp.body().trim.isEmpty) JNull else JsonMethods.parse(resp.body()))
  }

  test("stream load: labeled bulk ingest is exactly-once, grant-gated, audited") {
    val url = "jdbc:derby:memory:restload;create=true"
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 'l1'), ('bob', 'l2')")
    } finally conn0.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?",
      maxConcurrentPerUser = 2)
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    GraftRestServer.start(spark, 0)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rest_a")
      spark.sql("DROP TABLE IF EXISTS graft_cat.rest_a.loads")
      spark.sql("CREATE TABLE graft_cat.rest_a.loads (k BIGINT, s STRING) USING graft")
      GraftAuthz.grant("alice", "rest_a", "ALL")
      val alice = basic("alice", "l1")

      // labeled CSV load lands
      val (c1, j1) = put("/graft_cat.rest_a/loads/_stream_load", alice,
        "1,one\n2,two\n", Map("label" -> "batch-001"))
      assert(c1 == 200 && str(j1, "Status") == "Success", j1)
      assert(spark.table("graft_cat.rest_a.loads").count() == 2L)

      // the SAME label retried (even with a different body) is a no-op
      // answered Label Already Exists — the Doris exactly-once contract
      val (c2, j2) = put("/graft_cat.rest_a/loads/_stream_load", alice,
        "9,nine\n", Map("label" -> "batch-001"))
      assert(c2 == 200 && str(j2, "Status") == "Label Already Exists", j2)
      assert(spark.table("graft_cat.rest_a.loads").count() == 2L,
        "a replayed label must not land twice")

      // a NEW label with JSONL format lands alongside
      val (c3, j3) = put("/graft_cat.rest_a/loads/_stream_load", alice,
        """{"k":3,"s":"three"}""" + "\n", Map("label" -> "batch-002", "format" -> "json"))
      assert(c3 == 200 && str(j3, "Status") == "Success", j3)
      assert(spark.table("graft_cat.rest_a.loads").count() == 3L)

      // a malformed row refuses the WHOLE load (a label is a txn)
      val (c4, _) = put("/graft_cat.rest_a/loads/_stream_load", alice,
        "4,ok\nnot-a-bigint,bad\n", Map("label" -> "batch-003"))
      assert(c4 == 400, s"malformed row must refuse the load, got $c4")
      assert(spark.table("graft_cat.rest_a.loads").count() == 3L)

      // missing label → 400 (no silent at-least-once ingest)
      val (c5, _) = put("/graft_cat.rest_a/loads/_stream_load", alice,
        "5,five\n", Map.empty)
      assert(c5 == 400)

      // bob has no MODIFY grant on rest_a → 403, nothing lands
      val (c6, _) = put("/graft_cat.rest_a/loads/_stream_load", basic("bob", "l2"),
        "6,six\n", Map("label" -> "bob-001"))
      assert(c6 == 403, s"ungranted principal must be refused, got $c6")
      assert(spark.table("graft_cat.rest_a.loads").count() == 3L)

      // an oversized body answers 413, nothing lands (driver-memory
      // bound; pinned with a tiny cap via system property)
      System.setProperty("graft.rest.streamLoadMaxBytes", "64")
      try {
        val (c7, _) = put("/graft_cat.rest_a/loads/_stream_load", alice,
          "7," + ("x" * 100) + "\n", Map("label" -> "batch-big"))
        assert(c7 == 413, s"oversized load must be refused, got $c7")
        assert(spark.table("graft_cat.rest_a.loads").count() == 3L)
      } finally System.clearProperty("graft.rest.streamLoadMaxBytes")

      // audit trail: the landed load, the dup, and bob's denial
      GraftAudit.flush(5000L)
      val trail = spark.sql("CALL graft_cat.system.show_audit(200)").collect()
      def has(u: String, verdict: String) = trail.exists(r =>
        r.getString(1) == u && r.getString(2) == "INGEST" &&
          r.getString(3).contains("loads") && r.getString(4) == verdict)
      assert(has("alice", "ok"), "landed load must be audited")
      assert(has("alice", "dup"), "replayed label must be audited as dup")
      assert(trail.exists(r => r.getString(1) == "bob" && r.getString(4) == "deny"),
        "denied ingest must be audited")
    } finally {
      GraftRestServer.stop()
      GraftAuthz.disable()
      ConnectAuth.disable()
    }
  }

  test("stream load: two concurrent twins on one label — exactly one lands") {
    // The doc contract says "two concurrent twins can never both
    // land — the claim race arbitrates". Pin it with a REAL race:
    // both PUTs in flight at once (barrier-released), not a replay
    // after the first committed. Doris semantics: one Success, one
    // Label Already Exists, the payload lands exactly once.
    val url = "jdbc:derby:memory:restrace;create=true"
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      st.execute("INSERT INTO gateway_users VALUES ('alice', 'l1')")
    } finally conn0.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?",
      maxConcurrentPerUser = 4)
    GraftAuthz.enable(url, superusers = Set(spark.sparkContext.sparkUser))
    GraftRestServer.start(spark, 0)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rest_race")
      spark.sql("DROP TABLE IF EXISTS graft_cat.rest_race.loads")
      spark.sql("CREATE TABLE graft_cat.rest_race.loads (k BIGINT, s STRING) USING graft")
      GraftAuthz.grant("alice", "rest_race", "ALL")
      val alice = basic("alice", "l1")
      import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit, Callable}
      val barrier = new CyclicBarrier(2)
      val pool = Executors.newFixedThreadPool(2)
      try {
        val futs = (0 until 2).map { _ =>
          pool.submit(new Callable[(Int, JValue)] {
            def call(): (Int, JValue) = {
              barrier.await(10, TimeUnit.SECONDS)
              put("/graft_cat.rest_race/loads/_stream_load", alice,
                "1,one\n2,two\n", Map("label" -> "race-001"))
            }
          })
        }
        val rs = futs.map(_.get(120, TimeUnit.SECONDS))
        rs.foreach { case (c, j) => assert(c == 200, s"$c $j") }
        val statuses = rs.map { case (_, j) => str(j, "Status") }.sorted
        assert(statuses == Seq("Label Already Exists", "Success"), statuses)
        assert(spark.table("graft_cat.rest_race.loads").count() == 2L,
          "the racing twins must land the payload exactly once")
      } finally pool.shutdownNow()
    } finally {
      GraftRestServer.stop()
      GraftAuthz.disable()
      ConnectAuth.disable()
    }
  }

  test("rest wire registers in gateway discovery and resolves on failover") {
    val url = "jdbc:derby:memory:restdisc;create=true"
    import GatewayDiscovery.Endpoint
    // a dead host's lapsed lease is ignored; the live REST host resolves
    GatewayDiscovery.register(url, Endpoint("hostA", 15002,
      restPort = Some(10099)), leaseMillis = 60000L)
    GatewayDiscovery.deregister()
    ControlPlaneDb.withConn(url, None, None) { conn =>
      conn.createStatement().execute(
        "INSERT INTO graft_gateways(host, port, lease_expiry, rest_port) " +
          s"VALUES ('deadhost', 15003, ${System.currentTimeMillis() - 1000}, 10099)")
    }
    GatewayDiscovery.register(url, Endpoint("hostB", 15004,
      restPort = Some(20099)), leaseMillis = 60000L)
    try {
      val r = GatewayDiscovery.resolveRest(url)
      assert(r.exists(e => e.host == "hostB" && e.restPort.contains(20099)), r)
    } finally GatewayDiscovery.deregister()
  }
}
