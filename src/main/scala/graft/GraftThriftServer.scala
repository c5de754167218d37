package graft

import org.apache.spark.sql.SparkSession

/** HiveServer2 Thrift JDBC endpoint over the graft engine — the
  * reference platform's user-facing SQL port. The reference fronts its
  * Spark engines with Kyuubi's Thrift frontend
  * (`kyuubi.frontend.thrift.binary.bind.port: 10009` /
  * `kyuubi.frontend.thrift.http.bind.port: 10010`, reference
  * api/v1alpha1/ninecluster_metadata.go:23-24), which is what beeline,
  * every Hive-JDBC client and every BI tool speaks; Spark Connect gRPC
  * (C18) cannot serve those. This module stands up Spark's bundled
  * HiveThriftServer2 over the SAME engine session the gRPC gateway
  * serves, with the whole C22/C24/C27/C28/C30 control plane applying
  * to Thrift-borne queries:
  *
  *   - **Authentication (C22)**: `hive.server2.authentication=CUSTOM`
  *     routes every SASL PLAIN login through
  *     [[GraftThriftAuthProvider]], which validates against the SAME
  *     JDBC credential query ConnectAuth enforces on gRPC — Kyuubi's
  *     JDBC-auth contract (reference internal/controller/
  *     kyuubi.go:55-63) on the Thrift leg.
  *   - **Identity binding**: each connection's per-session
  *     SparkSession maps back (reference identity, via ThriftGlue) to
  *     its HiveSession's SASL-verified username —
  *     [[GraftAuthIdentity]] resolves THAT, never a client-settable
  *     conf, so `?spark.graft.sql.user=...` URL overrides cannot
  *     impersonate another tenant.
  *   - **Authorization (C24) + row/column policies (C27) + audit
  *     (C28)**: enforced inside the catalog against the bound
  *     identity, so they apply to Thrift queries with zero extra
  *     wiring; denials land in `CALL graft_cat.system.show_audit()`.
  *   - **Admission control (C30)**: ExecuteStatement shares
  *     ConnectAuth's per-principal in-flight cap (the Thrift twin of
  *     the gRPC ExecutePlan gate); over-cap statements fail fast with
  *     RESOURCE_EXHAUSTED and are audited.
  *
  * Deploy stance: one Thrift endpoint per gateway host, port from the
  * reference's contract (10009 binary); discovery/HA ride the same
  * GatewayDiscovery heartbeat as the gRPC endpoint (C23/C26) — a
  * JDBC client fails over by re-resolving live hosts from the shared
  * control-plane DB.
  */
object GraftThriftServer {

  @volatile private var server: Option[AnyRef] = None

  def started: Boolean = server.isDefined

  /** Start the Thrift endpoint on `port`. Authentication follows
    * ConnectAuth: when a credential query is configured
    * (`ConnectAuth.enable`), logins authenticate CUSTOM through it;
    * otherwise the endpoint is open (NOSASL-equivalent trust, the
    * Kyuubi `authentication=NONE` mode). Call ConnectAuth.enable
    * BEFORE start — the auth mode is fixed at server bring-up.
    */
  def start(spark: SparkSession, port: Int = 10009,
      bindHost: String = "localhost"): Unit = synchronized {
    if (server.isDefined) return
    // HiveConf reads `hive.*` system properties at construction; this
    // is the supported way to configure an embedded HiveServer2.
    System.setProperty("hive.server2.thrift.port", port.toString)
    System.setProperty("hive.server2.thrift.bind.host", bindHost)
    System.setProperty("hive.server2.enable.doAs", "false")
    // Two operation managers exist after the ThriftGlue swap (the
    // orphaned stock one and graft's); per-operation log capture
    // would double-register its log appender — and it's a beeline
    // nicety, not an engine function. Off for both.
    System.setProperty("hive.server2.logging.operation.enabled", "false")
    if (ConnectAuth.required) {
      System.setProperty("hive.server2.authentication", "CUSTOM")
      System.setProperty("hive.server2.custom.authentication.class",
        classOf[GraftThriftAuthProvider].getName)
    } else {
      System.setProperty("hive.server2.authentication", "NONE")
    }
    server = Some(
      org.apache.spark.sql.hive.thriftserver.graftglue.ThriftGlue.startWithGraft(
        spark.sqlContext,
        tryAcquire = ConnectAuth.tryAcquire,
        release = ConnectAuth.release,
        auditDeny = (user, _) =>
          GraftAudit.record(user, "THRIFT_EXECUTE", "*", "deny")))
  }

  def stop(): Unit = synchronized {
    server.foreach(org.apache.spark.sql.hive.thriftserver.graftglue.ThriftGlue.stop)
    server = None
  }

  /** The SASL-authenticated owner of `spark`, if it is a Thrift
    * per-connection session.
    */
  private[graft] def thriftUserOf(spark: SparkSession): Option[String] =
    if (server.isEmpty) None
    else org.apache.spark.sql.hive.thriftserver.graftglue.ThriftGlue.thriftUserOf(spark)
}

/** Hive CUSTOM-auth provider (zero-arg, instantiated reflectively by
  * HiveServer2's CustomAuthenticationProviderImpl): the Thrift twin of
  * the gRPC interceptor's credential check — same ConnectAuth config,
  * same JDBC credential query, same verified-pair TTL cache.
  */
final class GraftThriftAuthProvider
    extends org.apache.hive.service.auth.PasswdAuthenticationProvider {
  override def Authenticate(user: String, password: String): Unit =
    if (!ConnectAuth.check(user, password))
      throw new javax.security.sasl.AuthenticationException(
        "graft thrift endpoint: missing or invalid credentials")
}
