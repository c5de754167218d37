package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named registry queries to files —
  * the measurement harness for optimization rounds (guide §1: capture
  * the plan shape — Exchange count, join strategy, PushedFilters —
  * before and after each change).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [q1,q2,...]
  * Writes <outDir>/<name>_<suffix>.txt per query. Queries whose
  * DataFrame construction executes work (streaming rows, staged verbs)
  * still produce the plan of their RESULT DataFrame; construction
  * failures are recorded in the file instead of aborting the sweep.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val wanted: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    // Optional session confs (k=v;k=v) — lets the dump capture the
    // "before" plan shape through a kill-switch conf.
    sys.env.get("SPARK_GRAFT_PLAN_CONFS").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    Files.createDirectories(Paths.get(outDir))
    val selected = wanted.fold(graft.Registry.all)(w => graft.Registry.all.filter(q => w(q.name)))
    selected.foreach { q =>
      val text =
        try {
          q.setup.foreach(_(spark, sfDir))
          val df = q.verb.getOrElse(q.run)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"PLAN CAPTURE FAILED: ${e.toString.take(2000)}" }
      Files.write(Paths.get(outDir, s"${q.name}_$suffix.txt"), text.getBytes("UTF-8"))
      println(s"[plandump] ${q.name} -> ${q.name}_$suffix.txt")
    }
    spark.stop()
  }
}
