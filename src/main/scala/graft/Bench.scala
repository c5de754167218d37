package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    // Warm the session (FS listing, parquet footers, codegen infra)
    // so the first measured query isn't charged for JVM startup.
    Tables.names.foreach(n => try Tables(spark, sfDir, n).count() catch { case _: Throwable => () })
    // Materialize through the noop sink — unlike count(), it cannot
    // elide top-level sorts/projections — and take the median of
    // `runs` executions so a machine-load spike on one run doesn't
    // become the reported number.
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.toString.take(500)}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val ts = (1 to runs).map(_ => once(name, fn)).sorted
      name -> ts(ts.size / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
