package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** JDBC-backed catalog store (GraftCatalogStore.scala) — the
  * reference platform's DB-backed metastore capability
  * (internal/controller/metastore.go): engine hosts that do NOT share
  * a filesystem root still share one name registry, because
  * namespaces, table locations and view definitions live in a JDBC
  * database (embedded Derby here; any JDBC DB in production).
  *
  * Two sessions stand in for two gateway hosts: each registers the
  * same catalog name over a DIFFERENT warehouse root and the same
  * catalog DB. Tables created by either host resolve — and serve
  * reads, appends, renames and drops — from the other, with data
  * living under whichever host's root created it.
  */
class JdbcCatalogSpec extends AnyFunSuite {
  import SharedSpark.spark

  private val url = "jdbc:derby:memory:jcatspec;create=true"

  private def host(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.jshared", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.jshared.root", root)
    s.conf.set("spark.sql.catalog.jshared.store", "jdbc")
    s.conf.set("spark.sql.catalog.jshared.jdbc.url", url)
    s
  }

  test("two hosts with distinct warehouse roots share one JDBC metastore") {
    val rootA = GraftSession.catalogRoot + "_jdbc_host_a"
    val rootB = GraftSession.catalogRoot + "_jdbc_host_b"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootA))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootB))
    val a = host(rootA)
    val b = host(rootB)

    // Namespace created on host A is visible on host B (no shared FS).
    a.sql("CREATE NAMESPACE jshared.db")
    assert(b.sql("SHOW NAMESPACES IN jshared").collect().map(_.getString(0))
      .contains("db"))

    // A's table serves B's queries; the DATA lives under A's root.
    a.sql("CREATE TABLE jshared.db.t AS SELECT id AS k, id % 5 AS g FROM range(100)")
    assert(b.sql("SELECT count(*) AS n FROM jshared.db.t").collect()(0).getLong(0) == 100L)
    def dataDirs(root: String, prefix: String): Seq[java.io.File] =
      Option(new java.io.File(s"$root/db").listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isDirectory && f.getName.startsWith(prefix + "-"))
    assert(dataDirs(rootA, "t").size == 1, "data lives under A's root")
    assert(dataDirs(rootB, "t").isEmpty)
    val tDir = dataDirs(rootA, "t").head

    // B appends INTO A's table (location-addressed; the LakeTable
    // commit claim arbitrates the write) — A sees the new rows.
    b.sql("INSERT INTO jshared.db.t SELECT id, id % 5 FROM range(100, 150)")
    assert(a.sql("SELECT count(*) AS n FROM jshared.db.t").collect()(0).getLong(0) == 150L)

    // B's own table lands under B's root; A resolves it by name.
    b.sql("CREATE TABLE jshared.db.u AS SELECT id AS k FROM range(7)")
    assert(a.sql("SELECT count(*) AS n FROM jshared.db.u").collect()(0).getLong(0) == 7L)
    assert(dataDirs(rootB, "u").size == 1)

    // Both hosts list both tables.
    val tablesSeenByA = a.sql("SHOW TABLES IN jshared.db").collect().map(_.getString(1)).toSet
    assert(tablesSeenByA == Set("t", "u"), tablesSeenByA)

    // Rename is an O(1) registry update: the name moves, the data
    // directory does not.
    b.sql("ALTER TABLE jshared.db.t RENAME TO jshared.db.t2")
    assert(a.sql("SELECT count(*) AS n FROM jshared.db.t2").collect()(0).getLong(0) == 150L)
    assert(tDir.exists()) // location unchanged
    val e = intercept[Exception] { a.sql("SELECT * FROM jshared.db.t").collect() }
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") || e.getMessage.contains("t"), e.getMessage)

    // The cross-host serving path is the SAME V2 parquet scan: filters
    // push down and columns prune even when the table resolved through
    // the DB to another host's root.
    val q = b.sql("SELECT g FROM jshared.db.t2 WHERE k = 42")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,42)]"), plan)
    assert(plan.contains("ReadSchema: struct<k:bigint,g:bigint>"), plan)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(42L % 5))

    // Views live in the DB too: created on A, served on B, inlined.
    a.sql("CALL jshared.system.create_view('db.v', 'SELECT g, count(*) AS n FROM jshared.db.t2 GROUP BY g', true)")
    assert(b.sql("SELECT sum(n) AS s FROM jshared.db.v").collect()(0).getLong(0) == 150L)

    // Maintenance procedures resolve the cross-root location through
    // the store: B compacts A's table.
    assert(b.sql("CALL jshared.system.compact('db.t2', 1)").collect()(0).getLong(0) >= 1L)
    assert(a.sql("SELECT count(*) AS n FROM jshared.db.t2").collect()(0).getLong(0) == 150L)

    // Drop from B unregisters for A and deletes the data dir.
    b.sql("DROP TABLE jshared.db.v")
    b.sql("DROP TABLE jshared.db.t2")
    assert(!tDir.exists())
    assert(intercept[Exception] {
      a.sql("SELECT * FROM jshared.db.t2").collect()
    }.getMessage.nonEmpty)
    b.sql("DROP TABLE jshared.db.u")
    a.sql("DROP NAMESPACE jshared.db")
    assert(!b.sql("SHOW NAMESPACES IN jshared").collect().map(_.getString(0)).contains("db"))
  }

  test("concurrent CREATE of one name across hosts: the registry's primary key elects one winner") {
    val rootA = GraftSession.catalogRoot + "_jdbc_race_a"
    val rootB = GraftSession.catalogRoot + "_jdbc_race_b"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootA))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootB))
    val a = host(rootA)
    val b = host(rootB)
    a.sql("CREATE NAMESPACE IF NOT EXISTS jshared.race")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq(a -> 11, b -> 22).map { case (s, n) =>
      new Thread(() => {
        try {
          s.sql(s"CREATE TABLE jshared.race.c AS SELECT id FROM range($n)")
          wins.incrementAndGet()
        } catch { case _: Throwable => losses.incrementAndGet() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1 && losses.get() == 1, s"wins=${wins.get} losses=${losses.get}")
    // Whichever host won, both serve the committed table coherently.
    val n = a.sql("SELECT count(*) AS n FROM jshared.race.c").collect()(0).getLong(0)
    assert(n == 11L || n == 22L, n)
    assert(b.sql("SELECT count(*) AS n FROM jshared.race.c").collect()(0).getLong(0) == n)
    b.sql("DROP TABLE jshared.race.c")
    a.sql("DROP NAMESPACE jshared.race")
  }
}
