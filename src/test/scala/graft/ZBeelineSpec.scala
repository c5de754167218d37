package graft

import org.scalatest.funsuite.AnyFunSuite

/** beeline — THE CLI the reference's users run against its Kyuubi
  * Thrift port — drives the graft Thrift endpoint end-to-end in a real
  * separate JVM process (the distribution's own beeline classes over
  * hive-jdbc): connect with credentials, run catalog SQL, read the
  * answer back from the CLI's table output. Named Z* so it runs after
  * ThriftGatewaySpec in sequential suite order: the endpoint's auth
  * mode is fixed at first start, and that spec needs CUSTOM auth
  * enabled before bring-up.
  */
class ZBeelineSpec extends AnyFunSuite {
  import SharedSpark.spark

  private val port = 14999

  test("a real beeline process connects, authenticates and queries graft_cat") {
    // Same endpoint as ThriftGatewaySpec (idempotent start). If this
    // suite runs first, enable auth so bring-up picks CUSTOM — the
    // mode that spec requires.
    val url = "jdbc:derby:memory:beelineauth;create=true"
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      try st.execute("CREATE TABLE gateway_users(user_name VARCHAR(64), token VARCHAR(64))")
      catch { case _: java.sql.SQLException => () } // exists from a prior run
      st.execute("DELETE FROM gateway_users")
      st.execute("INSERT INTO gateway_users VALUES ('cli', 'clitoken')")
    } finally conn0.close()
    ConnectAuth.enable(url,
      "SELECT 1 FROM gateway_users WHERE user_name = ? AND token = ?")
    GraftThriftServer.start(spark, port)
    try {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.cli")
      spark.sql("DROP TABLE IF EXISTS graft_cat.cli.t")
      spark.sql("CREATE TABLE graft_cat.cli.t AS SELECT id, id % 2 AS g FROM range(10)")

      val javaBin = System.getProperty("java.home") + "/bin/java"
      val pb = new ProcessBuilder(javaBin,
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "-cp", "/opt/spark/jars/*",
        "org.apache.hive.beeline.BeeLine",
        "-u", s"jdbc:hive2://localhost:$port/default",
        "-n", "cli", "-p", "clitoken",
        "--outputformat=csv2", "--silent=true",
        "-e", "SELECT g, count(*) AS c, sum(id) AS s FROM graft_cat.cli.t GROUP BY g ORDER BY g")
      pb.redirectErrorStream(true)
      // EOF on stdin: a beeline that drops to its jline prompt (e.g. a
      // failed connect) exits instead of hanging the suite
      pb.redirectInput(new java.io.File("/dev/null"))
      val proc = pb.start()
      val out = try {
        val src = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
        try src.mkString finally src.close()
      } finally proc.waitFor()
      assert(proc.exitValue == 0, s"beeline exit ${proc.exitValue}:\n${out.takeRight(2000)}")
      // csv2 rows: g,c,s
      assert(out.contains("0,5,20") && out.contains("1,5,25"),
        s"beeline output missing expected rows:\n${out.takeRight(2000)}")
    } finally ConnectAuth.disable()
  }
}
