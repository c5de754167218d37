package graft.tools

/** Batch-level breakdown of the streaming rows: attaches a
  * StreamingQueryListener and prints per-batch durationMs maps
  * (addBatch / getBatch / queryPlanning / walCommit / stateCommit...)
  * plus the wall time around each registry verb — the streaming
  * analogue of reading the SQL tab (guide §7.1), which a headless
  * bench cannot open.
  *
  * Usage: runMain graft.tools.StreamProbe <q1,q2,...> [iters]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val wanted = args(0).split(",").map(_.trim).toSet
    val iters = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    graft.Tables.names.foreach(n =>
      try graft.Tables(spark, sfDir, n).count() catch { case _: Throwable => () })
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        log.add(s"START ${e.name} at ${System.currentTimeMillis()}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        log.add(s"BATCH ${p.name} id=${p.batchId} rows=${p.numInputRows} " +
          s"batchMs=${p.batchDuration} durations=${p.durationMs}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        log.add(s"END at ${System.currentTimeMillis()}")
    })
    val selected = graft.Registry.all.filter(q => wanted(q.name))
    for (i <- 1 to iters; q <- selected) {
      try q.setup.foreach(_(spark, sfDir)) catch { case _: Throwable => () }
      org.apache.spark.sql.graftglue.Glue.unloadStateStores()
      System.gc()
      log.clear()
      val t0 = System.nanoTime()
      try q.verb.getOrElse(q.run)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[probe] ${q.name} FAILED ${e.toString.take(200)}") }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] ${q.name} iter$i wall=$wall%.2f s")
      log.forEach(l => println(s"[probe]   $l"))
    }
    spark.stop()
  }
}
