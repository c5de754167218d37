package graft.tools

/** One-off phase breakdown of q_dedup_clusters (guide §1). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.create("local[32]", 32)
    graft.Tables.names.foreach(n => try graft.Tables(s, d, n).count() catch { case _: Throwable => () })
    def time[T](label: String)(f: => T): T = {
      System.gc(); val t0 = System.nanoTime; val r = f
      println(f"[probe] $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm
    graft.operators.Clustering.dedupClusters(s, d).write.mode("overwrite").format("noop").save()
    for (_ <- 1 to 2) {
      val pairs = time("ngramPairs(0.8) count") {
        graft.operators.DedupOps.ngramPairs(s, d, 0.8).count() }
      println(s"[probe]   pairs=$pairs")
      time("clusterLabels fixpoint") {
        graft.operators.Clustering.clusterLabels(s, d).count() }
      time("dedupClusters total") {
        graft.operators.Clustering.dedupClusters(s, d)
          .write.mode("overwrite").format("noop").save() }
    }
    s.stop()
  }
}
