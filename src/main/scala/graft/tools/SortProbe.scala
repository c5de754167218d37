package graft.tools

import org.apache.spark.sql.functions._

/** One-off experiment (guide §1): does a final global sort re-execute
  * a heavy upstream map through range-bound sampling, and does staging
  * an exchange above the map fix it?
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.create("local[32]", 32)
    graft.Tables.names.foreach(n => try graft.Tables(s, d, n).count() catch { case _: Throwable => () })
    def time(label: String)(f: => Unit): Unit = {
      System.gc(); val t0 = System.nanoTime; f
      println(f"[probe] $label ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    def media = graft.operators.Multimodal
      .decodeFeatures(graft.operators.Multimodal.syntheticMedia(s, d))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("duration_ms"), col("n_bytes"))
    media.orderBy("doc_id").write.mode("overwrite").format("noop").save() // warm
    for (_ <- 1 to 3) {
      time("sorted-direct") { media.orderBy("doc_id").write.mode("overwrite").format("noop").save() }
      time("sorted-staged") { media.repartition(32).orderBy("doc_id").write.mode("overwrite").format("noop").save() }
      time("unsorted     ") { media.write.mode("overwrite").format("noop").save() }
    }
    s.stop()
  }
}
