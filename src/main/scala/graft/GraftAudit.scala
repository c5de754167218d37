package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Engine audit trail (C28): every authorization decision — allowed or
  * denied reads/writes, grant administration, direct-path rejections —
  * lands in the shared control-plane database (the same DB that holds
  * credentials, grants and the catalog registry), so a multi-tenant
  * deployment can answer "who touched what, when, and was it allowed"
  * without scraping driver logs. The reference stack gets this from
  * Kyuubi/Ranger audit sinks; here it is engine-native.
  *
  * Scale stance: audit MUST NOT sit on the query hot path. `record`
  * is a non-blocking bounded-queue offer (O(1), never touches the DB);
  * a single daemon thread drains the queue in JDBC batches. Under
  * sustained overload the queue drops entries and counts them
  * (`dropped`) rather than back-pressuring queries — the same trade
  * every production audit pipeline makes. Transient DB failures are
  * retried with the batch held, mirroring the discovery heartbeat's
  * resilience.
  */
object GraftAudit {

  final case class Entry(atMs: Long, principal: String, verb: String,
      securable: String, decision: String)

  private final case class Sink(url: String, user: Option[String],
      password: Option[String])

  @volatile private var sink: Option[Sink] = None
  private val queue = new LinkedBlockingQueue[Entry](8192)
  // queued + in-flight entries not yet durable; flush() waits on 0.
  private val pending = new AtomicLong(0L)
  private val droppedCtr = new AtomicLong(0L)
  @volatile private var writer: Thread = null
  // monotonic tiebreak so same-millisecond entries keep arrival order
  private val seqCtr = new AtomicLong(0L)

  def enable(jdbcUrl: String, jdbcUser: Option[String] = None,
      jdbcPassword: Option[String] = None): Unit = synchronized {
    ControlPlaneDb.ensureTable(jdbcUrl, jdbcUser, jdbcPassword,
      "CREATE TABLE graft_audit(at_ms BIGINT, seq BIGINT, " +
        "principal VARCHAR(128), verb VARCHAR(32), securable VARCHAR(256), " +
        "decision VARCHAR(8))", "graft_audit")
    sink = Some(Sink(jdbcUrl, jdbcUser, jdbcPassword))
    if (writer == null || !writer.isAlive) {
      writer = new Thread(() => drainLoop(), "graft-audit-writer")
      writer.setDaemon(true)
      writer.start()
    }
  }

  def disable(): Unit = synchronized {
    flush(2000L)
    sink = None
  }

  def enabled: Boolean = sink.isDefined

  /** Entries discarded because the queue was full (overload). */
  def dropped: Long = droppedCtr.get()

  /** Non-blocking; safe to call from any query thread. */
  def record(principal: String, verb: String, securable: String,
      decision: String): Unit = if (sink.isDefined) {
    val e = Entry(System.currentTimeMillis(), principal, verb, securable, decision)
    pending.incrementAndGet()
    if (!queue.offer(e)) { pending.decrementAndGet(); droppedCtr.incrementAndGet() }
  }

  /** Wait (bounded) until everything recorded so far is durable. */
  def flush(timeoutMs: Long = 10000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (pending.get() > 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(10L)
  }

  /** The most recent `n` entries, newest first (the show_audit
    * procedure's backing query).
    */
  def tail(n: Int): Seq[Entry] = sink match {
    case None => Nil
    case Some(s) => ControlPlaneDb.withConn(s.url, s.user, s.password) { conn =>
      val ps = conn.prepareStatement(
        "SELECT at_ms, principal, verb, securable, decision FROM graft_audit " +
          "ORDER BY at_ms DESC, seq DESC")
      ps.setMaxRows(n)
      val rs = ps.executeQuery()
      val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
      try while (rs.next() && out.size < n)
        out += Entry(rs.getLong(1), rs.getString(2), rs.getString(3),
          rs.getString(4), rs.getString(5))
      finally rs.close()
      out.toSeq
    }
  }

  private def drainLoop(): Unit = {
    val batch = new java.util.ArrayList[Entry](256)
    while (true) {
      batch.clear()
      val first = queue.poll(500L, TimeUnit.MILLISECONDS)
      if (first != null) {
        batch.add(first)
        queue.drainTo(batch, 255)
        sink match {
          case None =>
            // audit turned off with entries in flight: count, move on
            droppedCtr.addAndGet(batch.size.toLong)
            pending.addAndGet(-batch.size.toLong)
          case Some(s) =>
            var attempts = 0
            var done = false
            while (!done && attempts < 3) {
              attempts += 1
              try {
                ControlPlaneDb.withConn(s.url, s.user, s.password) { conn =>
                  val ps = conn.prepareStatement(
                    "INSERT INTO graft_audit(at_ms, seq, principal, verb, " +
                      "securable, decision) VALUES (?, ?, ?, ?, ?, ?)")
                  batch.forEach { e =>
                    ps.setLong(1, e.atMs)
                    ps.setLong(2, seqCtr.incrementAndGet())
                    ps.setString(3, e.principal.take(128))
                    ps.setString(4, e.verb.take(32))
                    ps.setString(5, e.securable.take(256))
                    ps.setString(6, e.decision.take(8))
                    ps.addBatch()
                  }
                  ps.executeBatch()
                }
                done = true
              } catch {
                case _: java.sql.SQLException if attempts < 3 => Thread.sleep(200L)
                case _: java.sql.SQLException => // give up on this batch
              }
            }
            if (!done) droppedCtr.addAndGet(batch.size.toLong)
            pending.addAndGet(-batch.size.toLong)
        }
      }
    }
  }
}
