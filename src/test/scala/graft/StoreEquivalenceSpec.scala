package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's two metastore backends must be OBSERVATIONALLY
  * equivalent: any sequence of DDL operations (namespace/table
  * create, CTAS, drop, rename, existence probes, listings) succeeds
  * or fails the same way and leaves the same visible catalog state on
  * the FS-implied store and the JDBC store. A seeded random walk over
  * a small name space exercises the combinations a hand-written spec
  * would miss (create-over-existing, rename-onto-taken-name, drop of
  * a renamed table, …).
  */
class StoreEquivalenceSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("random DDL walks leave identical visible state on FS and JDBC stores") {
    val rootF = GraftSession.catalogRoot + "_eq_fs"
    val rootJ = GraftSession.catalogRoot + "_eq_jd"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootF))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(rootJ))
    spark.conf.set("spark.sql.catalog.eq_fs", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.eq_fs.root", rootF)
    spark.conf.set("spark.sql.catalog.eq_jd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.eq_jd.root", rootJ)
    spark.conf.set("spark.sql.catalog.eq_jd.store", "jdbc")
    spark.conf.set("spark.sql.catalog.eq_jd.jdbc.url", "jdbc:derby:memory:eqspec;create=true")

    val namespaces = Seq("n1", "n2")
    val names = Seq("a", "b", "c")
    val rnd = new scala.util.Random(20260813L)

    def run(cat: String, sql: String): Either[String, Seq[String]] =
      try Right(spark.sql(sql.replace("$C", cat)).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted)
      catch { case e: Exception => Left(e.getClass.getSimpleName) }

    def check(sql: String): Unit = {
      val (f, j) = (run("eq_fs", sql), run("eq_jd", sql))
      (f, j) match {
        case (Right(rf), Right(rj)) =>
          // Listings embed the catalog/root in some columns; compare
          // only sizes for SHOW, exact rows otherwise.
          if (sql.startsWith("SHOW")) assert(rf.size == rj.size, s"$sql -> $rf vs $rj")
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
      rnd.nextInt(7) match {
        case 0 => () => check(s"CREATE TABLE $$C.$ns.$t AS SELECT id AS k FROM range(${1 + rnd.nextInt(5)})")
        case 1 => () => check(s"DROP TABLE $$C.$ns.$t")
        case 2 => () => check(s"ALTER TABLE $$C.$ns.$t RENAME TO $ns.$t2")
        case 3 => () => check(s"SHOW TABLES IN $$C.$ns")
        case 4 => () => check(s"SELECT count(*) AS n FROM $$C.$ns.$t")
        case 5 => () => check(s"INSERT INTO $$C.$ns.$t SELECT 99")
        case 6 => () => check(s"SELECT k FROM $$C.$ns2.$t2 WHERE k < 3")
      }
    }
    ops.foreach(_.apply())
    // Terminal state: identical table sets in every namespace.
    namespaces.foreach { ns =>
      val f = run("eq_fs", s"SHOW TABLES IN $$C.$ns").toOption.get.map(_.split("\\|")(1)).sorted
      val j = run("eq_jd", s"SHOW TABLES IN $$C.$ns").toOption.get.map(_.split("\\|")(1)).sorted
      assert(f == j, s"terminal state in $ns: $f vs $j")
    }
  }
}
