package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's two metastore backends must be OBSERVATIONALLY
  * equivalent: any sequence of DDL operations (namespace/table
  * create, CTAS, drop, rename, view create, existence probes,
  * listings) succeeds or fails the same way and leaves the same
  * visible catalog state on the FS-implied store and the JDBC store.
  * A seeded random walk over a small name space exercises the
  * combinations a hand-written spec would miss (create-over-existing,
  * rename-onto-taken-name, drop of a renamed table, view/table name
  * collisions, …) — the walk found a real bug on its first run
  * (name-derived JDBC locations colliding after a rename).
  */
class StoreEquivalenceSpec extends AnyFunSuite {
  import SharedSpark.spark

  private def walk(tag: String, seed: Long): Unit = {
    val rootF = GraftSession.catalogRoot + s"_eq_fs_$tag"
    val rootJ = GraftSession.catalogRoot + s"_eq_jd_$tag"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootF))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootJ))
    // Catalog instances cache per session-state, so each walk gets its
    // own catalog NAMES (fresh plugins seeing this walk's confs).
    val (catF, catJ) = (s"eq_fs_$tag", s"eq_jd_$tag")
    spark.conf.set(s"spark.sql.catalog.$catF", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$catF.root", rootF)
    spark.conf.set(s"spark.sql.catalog.$catJ", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$catJ.root", rootJ)
    spark.conf.set(s"spark.sql.catalog.$catJ.store", "jdbc")
    spark.conf.set(s"spark.sql.catalog.$catJ.jdbc.url", s"jdbc:derby:memory:eqspec$tag;create=true")

    val namespaces = Seq("n1", "n2")
    val names = Seq("a", "b", "c")
    val rnd = new scala.util.Random(seed)

    def run(cat: String, sql: String): Either[String, Seq[String]] =
      try Right(spark.sql(sql.replace("$C", cat)).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted)
      catch { case e: Exception => Left(e.getClass.getSimpleName) }

    def check(sql: String): Unit = {
      val (f, j) = (run(catF, sql), run(catJ, sql))
      (f, j) match {
        case (Right(rf), Right(rj)) =>
          // Listings embed the catalog/root in some columns; compare
          // only sizes for SHOW/CALL, exact rows otherwise.
          if (sql.startsWith("SHOW") || sql.startsWith("CALL"))
            assert(rf.size == rj.size, s"$sql -> $rf vs $rj")
          else assert(rf == rj, s"$sql -> $rf vs $rj")
        case (Left(_), Left(_)) => () // both rejected: equivalent
        case other => fail(s"$sql diverged: $other")
      }
    }

    namespaces.foreach(ns => check(s"CREATE NAMESPACE IF NOT EXISTS $$C.$ns"))
    val ops: Seq[() => Unit] = (1 to 120).map { _ =>
      val ns = namespaces(rnd.nextInt(namespaces.size))
      val t = names(rnd.nextInt(names.size))
      val t2 = names(rnd.nextInt(names.size))
      val ns2 = namespaces(rnd.nextInt(namespaces.size))
      rnd.nextInt(8) match {
        case 0 => () => check(s"CREATE TABLE $$C.$ns.$t AS SELECT id AS k FROM range(${1 + rnd.nextInt(5)})")
        case 1 => () => check(s"DROP TABLE $$C.$ns.$t")
        case 2 => () => check(s"ALTER TABLE $$C.$ns.$t RENAME TO $ns.$t2")
        case 3 => () => check(s"SHOW TABLES IN $$C.$ns")
        case 4 => () => check(s"SELECT count(*) AS n FROM $$C.$ns.$t")
        case 5 => () => check(s"INSERT INTO $$C.$ns.$t SELECT 99")
        case 6 => () => check(s"SELECT k FROM $$C.$ns2.$t2 WHERE k < 3")
        case 7 => () => check(
          s"CALL $$C.system.create_view('$ns.$t2', 'SELECT count(*) AS n FROM $$C.$ns.$t', ${rnd.nextBoolean()})")
      }
    }
    ops.foreach(_.apply())
    // Terminal state: identical object sets (tables AND views) in
    // every namespace.
    namespaces.foreach { ns =>
      val f = run(catF, s"SHOW TABLES IN $$C.$ns").toOption.get.map(_.split("\\|")(1)).sorted
      val j = run(catJ, s"SHOW TABLES IN $$C.$ns").toOption.get.map(_.split("\\|")(1)).sorted
      assert(f == j, s"terminal state in $ns: $f vs $j")
    }
  }

  test("random DDL walks leave identical visible state on FS and JDBC stores") {
    walk("s1", 20260813L)
  }

  test("a second seed, views included, agrees too") {
    walk("s2", 4271L)
  }
}
