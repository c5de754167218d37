package graft

import java.sql.DriverManager

import org.sparkproject.connect.grpc.{Metadata, ServerCall, ServerCallHandler, ServerInterceptor, Status}

/** Credential gate for the Spark Connect gateway — the capability the
  * reference's Kyuubi endpoint gets from JDBC authentication with a
  * credential query (reference internal/controller/kyuubi.go:55-63,
  * `kyuubi.authentication=JDBC` + `authentication.jdbc.url/user/
  * password/query`; LDAP-capable the same way). A multi-tenant SQL
  * endpoint that accepts any client is not deployable; this closes
  * the round-4 "What's missing" #1.
  *
  * Wiring: [[GraftAuthInterceptor]] is registered via
  * `spark.connect.grpc.interceptor.classes` (instantiated reflectively
  * by SparkConnectInterceptorRegistry when the service starts; the
  * distribution shades gRPC as org.sparkproject.connect.grpc, so the
  * interceptor implements the shaded interface). Until
  * [[ConnectAuth.enable]] is called the interceptor passes everything
  * through; enabling it makes every RPC carry `graft_user` /
  * `graft_token` metadata (clients append
  * `;graft_user=…;graft_token=…` to the connection string — the
  * Connect spec forwards non-reserved params as per-request gRPC
  * metadata) that must satisfy the configured credential query.
  */
object ConnectAuth {

  /** `credentialQuery` is a two-placeholder SELECT (user, token) that
    * returns a row iff the pair is valid, e.g.
    * `SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?`
    * — the exact Kyuubi JDBC-auth contract. `jdbcUser`/`jdbcPassword`
    * mirror Kyuubi's `authentication.jdbc.user/password` parameters so
    * the credential-DB login never has to ride inside the URL;
    * `cacheTtlMillis` bounds how long a verified pair skips the DB
    * round trip (a revoked token stops working within the TTL).
    */
  final case class Config(jdbcUrl: String, credentialQuery: String,
      jdbcUser: Option[String] = None, jdbcPassword: Option[String] = None,
      cacheTtlMillis: Long = 60000L, maxConcurrentPerUser: Int = 0)

  @volatile private var cfg: Option[Config] = None
  // Verified pairs skip the JDBC round trip until their TTL lapses
  // (one probe per session would still be fine; per-RPC probes would
  // hammer the credential DB). Cleared on every enable/disable.
  private val verified = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def enable(jdbcUrl: String, credentialQuery: String,
      jdbcUser: Option[String] = None, jdbcPassword: Option[String] = None,
      cacheTtlMillis: Long = 60000L, maxConcurrentPerUser: Int = 0): Unit = {
    verified.clear(); inFlight.clear()
    cfg = Some(Config(jdbcUrl, credentialQuery, jdbcUser, jdbcPassword,
      cacheTtlMillis, maxConcurrentPerUser))
  }

  def disable(): Unit = { cfg = None; verified.clear(); inFlight.clear() }

  def required: Boolean = cfg.isDefined

  // ---- per-principal admission control (Kyuubi's operation limits) --
  // A multi-tenant gateway without a concurrency cap lets one tenant
  // queue the whole engine. The cap counts IN-FLIGHT ExecutePlan RPCs
  // per authenticated principal: admission is an O(1) atomic bump at
  // the interceptor (no lock, no DB), excess calls fail fast with
  // RESOURCE_EXHAUSTED instead of silently queueing — the client can
  // back off and retry, and other tenants' capacity is untouched.

  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()

  /** True = admitted (caller MUST release); also true when no cap is
    * configured.
    */
  private[graft] def tryAcquire(user: String): Boolean = cfg match {
    case Some(c) if c.maxConcurrentPerUser > 0 && user != null =>
      val ctr = inFlight.computeIfAbsent(user,
        _ => new java.util.concurrent.atomic.AtomicInteger())
      if (ctr.incrementAndGet() > c.maxConcurrentPerUser) { ctr.decrementAndGet(); false }
      else true
    case _ => true
  }

  private[graft] def release(user: String): Unit = {
    val ctr = if (user == null) null else inFlight.get(user)
    if (ctr != null) ctr.decrementAndGet()
  }

  /** In-flight gated calls for `user` (spec observability). */
  private[graft] def inFlightOf(user: String): Int = {
    val ctr = inFlight.get(user)
    if (ctr == null) 0 else ctr.get()
  }

  private[graft] def check(user: String, token: String): Boolean = cfg match {
    case None => true
    case Some(c) =>
      if (user == null || token == null) false
      else {
        // NUL separator: a character neither field can carry through
        // gRPC ASCII metadata, so ("a b","c") and ("a","b c") never
        // collide as cache keys.
        val key = user + "\u0000" + token
        val now = System.currentTimeMillis()
        val hit = verified.get(key)
        (hit != null && now - hit < c.cacheTtlMillis) || {
          val conn = (c.jdbcUser, c.jdbcPassword) match {
            case (Some(u), p) => DriverManager.getConnection(c.jdbcUrl, u, p.orNull)
            case _ => DriverManager.getConnection(c.jdbcUrl)
          }
          val ok =
            try {
              val ps = conn.prepareStatement(c.credentialQuery)
              ps.setString(1, user)
              ps.setString(2, token)
              val rs = ps.executeQuery()
              try rs.next() finally rs.close()
            } finally conn.close()
          if (ok) verified.put(key, now) else verified.remove(key)
          ok
        }
      }
  }
}

/** The gRPC interceptor itself (zero-arg constructor — the registry
  * instantiates it reflectively). Rejections close the call with
  * UNAUTHENTICATED before any Connect handler runs.
  *
  * Identity binding (the GraftAuthz trust chain): when auth is
  * enabled, every request's `user_context.user_id` — the identity
  * Connect keys its server-side sessions by, and the one
  * [[GraftAuthIdentity]] resolves grants against — must EQUAL the
  * authenticated `graft_user`. Without this, a tenant could present
  * their own valid credentials while claiming another tenant's
  * user_id and inherit that tenant's grants. The proto shapes are
  * checked reflectively (every Connect request message carries
  * `getUserContext`), so the binding covers all RPCs without
  * enumerating them.
  */
final class GraftAuthInterceptor extends ServerInterceptor {
  private val UserKey = Metadata.Key.of("graft_user", Metadata.ASCII_STRING_MARSHALLER)
  private val TokenKey = Metadata.Key.of("graft_token", Metadata.ASCII_STRING_MARSHALLER)

  override def interceptCall[ReqT, RespT](call: ServerCall[ReqT, RespT],
      headers: Metadata, next: ServerCallHandler[ReqT, RespT]): ServerCall.Listener[ReqT] = {
    if (!ConnectAuth.required) return next.startCall(call, headers)
    val user = headers.get(UserKey)
    if (!ConnectAuth.check(user, headers.get(TokenKey))) {
      call.close(Status.UNAUTHENTICATED.withDescription(
        "graft gateway: missing or invalid graft_user/graft_token credentials"), new Metadata())
      return new ServerCall.Listener[ReqT] {}
    }
    // Admission control: ExecutePlan is the RPC that consumes engine
    // capacity; cap a principal's in-flight executions (fail fast with
    // RESOURCE_EXHAUSTED — back off and retry — rather than letting
    // one tenant queue the engine). Metadata/analysis RPCs stay free.
    val gated = call.getMethodDescriptor.getFullMethodName.endsWith("ExecutePlan")
    if (gated && !ConnectAuth.tryAcquire(user)) {
      call.close(Status.RESOURCE_EXHAUSTED.withDescription(
        s"graft gateway: principal '$user' exceeded its concurrent-execution limit"),
        new Metadata())
      return new ServerCall.Listener[ReqT] {}
    }
    val delegate = next.startCall(call, headers)
    new org.sparkproject.connect.grpc.ForwardingServerCallListener
        .SimpleForwardingServerCallListener[ReqT](delegate) {
      @volatile private var closed = false
      private val released = new java.util.concurrent.atomic.AtomicBoolean(!gated)
      private def releaseOnce(): Unit =
        if (released.compareAndSet(false, true)) ConnectAuth.release(user)
      private def claimedUser(message: ReqT): String =
        try {
          val uc = message.getClass.getMethod("getUserContext").invoke(message)
          uc.getClass.getMethod("getUserId").invoke(uc).asInstanceOf[String]
        } catch { case _: Exception => "" } // non-plan message: nothing to bind
      override def onMessage(message: ReqT): Unit = {
        if (closed) return // already rejected: drop queued messages
        val claimed = claimedUser(message)
        if (claimed.nonEmpty && claimed != user) {
          closed = true
          call.close(Status.PERMISSION_DENIED.withDescription(
            s"graft gateway: user_context.user_id '$claimed' does not match " +
              s"authenticated graft_user '$user'"), new Metadata())
        } else super.onMessage(message)
      }
      override def onHalfClose(): Unit = if (!closed) super.onHalfClose()
      override def onCancel(): Unit = { releaseOnce(); if (!closed) super.onCancel() }
      override def onComplete(): Unit = { releaseOnce(); if (!closed) super.onComplete() }
    }
  }
}
