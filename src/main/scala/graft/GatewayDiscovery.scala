package graft

/** Gateway service discovery — the reference platform's ZooKeeper
  * registration for Kyuubi endpoints (reference
  * internal/controller/kyuubi.go:77-80: engines publish ephemeral
  * znodes, clients resolve a live endpoint and fail over), rebuilt on
  * the lease-table pattern over the SAME JDBC database the C25
  * metastore and C24 grant/credential tables use — one external
  * dependency serves the whole control plane.
  *
  * Each gateway host heartbeats one row (host, port, lease_expiry);
  * a row whose lease has lapsed is dead by definition — the DB clock
  * plays the ZooKeeper session timeout. Clients (or an L4 balancer's
  * health check) take any live row; resolution opportunistically
  * reaps lapsed rows so the table self-cleans. Writer safety needs no
  * leader election on top of this: LakeTable commits are
  * claim-arbitrated per table and the streaming sink is exactly-once
  * under replay, so two hosts accidentally running the same work
  * converge instead of corrupting (the C21/C23 guarantees).
  */
object GatewayDiscovery {

  /** A gateway host's advertised wires: `port` is the gRPC (Spark
    * Connect) endpoint, `thriftPort` the HiveServer2 Thrift endpoint
    * when the host serves one, `mysqlPort` the MySQL-protocol
    * endpoint, `restPort` the Kyuubi-REST HTTP endpoint — ONE lease
    * row carries all advertised wires, so the C23 failover story
    * covers every client kind with the same heartbeat (re-resolve via
    * [[resolveThrift]]/[[resolveMysql]]/[[resolveRest]]).
    */
  final case class Endpoint(host: String, port: Int, thriftPort: Option[Int] = None,
      mysqlPort: Option[Int] = None, restPort: Option[Int] = None)

  private final case class Reg(url: String, user: Option[String], pass: Option[String],
      endpoint: Endpoint, leaseMillis: Long, thread: Thread)

  @volatile private var reg: Option[Reg] = None

  private def withConn[A](url: String, u: Option[String], p: Option[String])
      (f: java.sql.Connection => A): A = ControlPlaneDb.withConn(url, u, p)(f)

  private def ensureTable(url: String, u: Option[String], p: Option[String]): Unit = {
    ControlPlaneDb.ensureTable(url, u, p,
      "CREATE TABLE graft_gateways(host VARCHAR(256), port INTEGER, " +
        "lease_expiry BIGINT, thrift_port INTEGER, mysql_port INTEGER, " +
        "rest_port INTEGER, PRIMARY KEY (host, port))",
      "graft_gateways")
    // Upgrade path: an older deployment's table lacks the wire
    // columns; rows it wrote read back as NULL (= wire not served) —
    // correct either way.
    withConn(url, u, p) { conn =>
      Seq("thrift_port", "mysql_port", "rest_port").foreach { c =>
        try conn.createStatement()
          .executeQuery(s"SELECT $c FROM graft_gateways WHERE 1 = 0").close()
        catch { case _: java.sql.SQLException =>
          conn.createStatement()
            .execute(s"ALTER TABLE graft_gateways ADD COLUMN $c INTEGER")
        }
      }
    }
  }

  private def beat(url: String, u: Option[String], p: Option[String],
      e: Endpoint, leaseMillis: Long): Unit =
    withConn(url, u, p) { conn =>
      val expiry = System.currentTimeMillis() + leaseMillis
      val upd = conn.prepareStatement(
        "UPDATE graft_gateways SET lease_expiry = ?, thrift_port = ?, " +
          "mysql_port = ?, rest_port = ? WHERE host = ? AND port = ?")
      def bindOpt(ps: java.sql.PreparedStatement, at: Int, v: Option[Int]): Unit =
        v match {
          case Some(n) => ps.setInt(at, n)
          case None => ps.setNull(at, java.sql.Types.INTEGER)
        }
      upd.setLong(1, expiry); bindOpt(upd, 2, e.thriftPort); bindOpt(upd, 3, e.mysqlPort)
      bindOpt(upd, 4, e.restPort)
      upd.setString(5, e.host); upd.setInt(6, e.port)
      if (upd.executeUpdate() == 0) {
        try {
          val ins = conn.prepareStatement(
            "INSERT INTO graft_gateways(host, port, lease_expiry, thrift_port, " +
              "mysql_port, rest_port) VALUES (?, ?, ?, ?, ?, ?)")
          ins.setString(1, e.host); ins.setInt(2, e.port); ins.setLong(3, expiry)
          bindOpt(ins, 4, e.thriftPort); bindOpt(ins, 5, e.mysqlPort)
          bindOpt(ins, 6, e.restPort)
          ins.executeUpdate()
        } catch { // lost an insert race to our own previous row: retry as update
          case ex: java.sql.SQLException if ControlPlaneDb.isDuplicateKey(ex) =>
            upd.executeUpdate()
        }
      }
    }

  /** Register this gateway and start the heartbeat (daemon thread, one
    * beat every leaseMillis/3 — two missed beats still leave a live
    * lease, the standard session-timeout margin).
    */
  def register(jdbcUrl: String, endpoint: Endpoint, leaseMillis: Long = 15000L,
      jdbcUser: Option[String] = None, jdbcPassword: Option[String] = None): Unit =
    synchronized {
      deregister()
      ensureTable(jdbcUrl, jdbcUser, jdbcPassword)
      beat(jdbcUrl, jdbcUser, jdbcPassword, endpoint, leaseMillis)
      val t = new Thread(() => {
        // A transient DB error (network blip, lock timeout) must NOT
        // kill the heartbeat: skip the beat and retry next interval —
        // the lease tolerates two misses by construction. Only
        // interruption (deregister) ends the loop.
        try while (!Thread.interrupted()) {
          Thread.sleep(math.max(1L, leaseMillis / 3))
          try beat(jdbcUrl, jdbcUser, jdbcPassword, endpoint, leaseMillis)
          catch {
            case _: InterruptedException => throw new InterruptedException
            case e: Exception =>
              System.err.println(s"[graft-gateway] heartbeat skipped: ${e.toString.take(200)}")
          }
        } catch { case _: InterruptedException => () }
      }, s"graft-gateway-heartbeat-${endpoint.host}:${endpoint.port}")
      t.setDaemon(true)
      t.start()
      reg = Some(Reg(jdbcUrl, jdbcUser, jdbcPassword, endpoint, leaseMillis, t))
    }

  /** Stop heartbeating and drop this host's row immediately — the
    * graceful-shutdown path (a crash just lets the lease lapse).
    */
  def deregister(): Unit = synchronized {
    reg.foreach { r =>
      r.thread.interrupt()
      try withConn(r.url, r.user, r.pass) { conn =>
        val del = conn.prepareStatement(
          "DELETE FROM graft_gateways WHERE host = ? AND port = ?")
        del.setString(1, r.endpoint.host); del.setInt(2, r.endpoint.port)
        del.executeUpdate()
      } catch { case _: Exception => () } // lease will lapse regardless
    }
    reg = None
  }

  /** Every endpoint with a live lease, expiry-descending (freshest
    * first). Lapsed rows are reaped in passing, so the table
    * self-cleans without a janitor.
    */
  def live(jdbcUrl: String, jdbcUser: Option[String] = None,
      jdbcPassword: Option[String] = None): Seq[Endpoint] = {
    ensureTable(jdbcUrl, jdbcUser, jdbcPassword)
    withConn(jdbcUrl, jdbcUser, jdbcPassword) { conn =>
      val now = System.currentTimeMillis()
      val reap = conn.prepareStatement("DELETE FROM graft_gateways WHERE lease_expiry < ?")
      reap.setLong(1, now); reap.executeUpdate()
      val ps = conn.prepareStatement(
        "SELECT host, port, thrift_port, mysql_port, rest_port FROM graft_gateways " +
          "WHERE lease_expiry >= ? ORDER BY lease_expiry DESC")
      ps.setLong(1, now)
      val rs = ps.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[Endpoint]
      def optPort(at: Int): Option[Int] = {
        val v = rs.getInt(at)
        if (rs.wasNull() || v <= 0) None else Some(v)
      }
      try while (rs.next()) {
        out += Endpoint(rs.getString(1), rs.getInt(2), optPort(3), optPort(4),
          optPort(5))
      } finally rs.close()
      out.toSeq
    }
  }

  /** A client's one-call resolver: the freshest live endpoint. */
  def resolve(jdbcUrl: String): Option[Endpoint] = live(jdbcUrl).headOption

  /** The freshest live endpoint that serves a Thrift wire — what a
    * hive-jdbc/beeline client re-resolves on failover (C36 + C26).
    */
  def resolveThrift(jdbcUrl: String, jdbcUser: Option[String] = None,
      jdbcPassword: Option[String] = None): Option[Endpoint] =
    live(jdbcUrl, jdbcUser, jdbcPassword).find(_.thriftPort.isDefined)

  /** The freshest live endpoint serving the MySQL wire (C38). */
  def resolveMysql(jdbcUrl: String, jdbcUser: Option[String] = None,
      jdbcPassword: Option[String] = None): Option[Endpoint] =
    live(jdbcUrl, jdbcUser, jdbcPassword).find(_.mysqlPort.isDefined)

  /** The freshest live endpoint serving the REST wire (C40). */
  def resolveRest(jdbcUrl: String, jdbcUser: Option[String] = None,
      jdbcPassword: Option[String] = None): Option[Endpoint] =
    live(jdbcUrl, jdbcUser, jdbcPassword).find(_.restPort.isDefined)
}
