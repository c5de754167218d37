package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test run (suites run sequentially;
  * see build.sbt Test/parallelExecution).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 8)
      .appName("graft-tests")
      // static conf read by SparkConnectService.start (ConnectGatewaySpec)
      .config("spark.connect.grpc.binding.port", "15999")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}
