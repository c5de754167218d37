package graft.tools

/** Interleaved A/B benchmark: time the same registry queries with a
  * session conf ON vs OFF, alternating within ONE JVM so machine
  * drift, JIT state and heap pressure hit both variants equally —
  * cross-invocation medians on a noisy host swing ±1 s/row, far above
  * the effects being measured (guide §1: measure correctly first).
  *
  * Usage: runMain graft.tools.AbBench <confKey> <q1,q2,...> [iters]
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val confKey = args(0)
    val wanted = args(1).split(",").map(_.trim).toSet
    val iters = if (args.length > 2) args(2).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    graft.Tables.names.foreach(n =>
      try graft.Tables(spark, sfDir, n).count() catch { case _: Throwable => () })
    val selected = graft.Registry.all.filter(q => wanted(q.name))
    def once(q: graft.Q): Double = {
      try q.setup.foreach(_(spark, sfDir)) catch { case _: Throwable => return -1.0 }
      val fn = q.verb.getOrElse(q.run)
      org.apache.spark.sql.graftglue.Glue.unloadStateStores()
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[ab] ${q.name} failed: ${e.toString.take(300)}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // Restore the key's PRE-RUN value afterwards: for a conf whose
    // production default is "false" (or unset), pinning it back to
    // "true" would leave the session in a non-default state.
    val preRun = spark.conf.getOption(confKey)
    val on = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val off = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    // Alternate which variant runs FIRST each iteration: the first
    // run of a query pays cold costs (FS cache, fresh codegen classes)
    // — a fixed order hands the second variant a ~0.3-1.2 s head start
    // (measured on a no-op control query).
    for (i <- 1 to iters; q <- selected;
         mode <- if (i % 2 == 1) Seq("true", "false") else Seq("false", "true")) {
      spark.conf.set(confKey, mode)
      val t = once(q)
      if (t >= 0) { if (mode == "true") on(q.name) ::= t else off(q.name) ::= t }
    }
    preRun match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    def med(xs: List[Double]) = { val s = xs.sorted; if (s.isEmpty) -1.0 else s(s.size / 2) }
    // Per-mode sample counts printed next to the medians: a failed run
    // in only one mode would otherwise silently skew the comparison.
    println(f"${"query"}%-32s ${"ON"}%8s ${"OFF"}%8s ${"delta"}%8s ${"nON/nOFF"}%9s")
    var tOn = 0.0; var tOff = 0.0
    selected.foreach { q =>
      val a = med(on(q.name)); val b = med(off(q.name))
      if (a >= 0 && b >= 0) { tOn += a; tOff += b }
      println(f"${q.name}%-32s $a%8.3f $b%8.3f ${b - a}%+8.3f ${s"${on(q.name).size}/${off(q.name).size}"}%9s")
    }
    println(f"TOTAL on=$tOn%.2f off=$tOff%.2f delta=${tOff - tOn}%+.2f (positive = ON wins)")
    spark.stop()
  }
}
