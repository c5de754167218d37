package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LakeTable
import graft.streaming.EventPipeline.Ev

class ExtrasSpec extends AnyFunSuite {
  import SharedSpark.{sf, spark}
  import spark.implicits._

  test("approx quantile stays within 5% of the exact percentile") {
    val approx = Registry.byName("q_approx_quantile").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Registry.byName("q_quantile").run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.05, s"$k p50")
      assert(math.abs(approx(k)._2 - p95) / p95 < 0.05, s"$k p95")
    }
  }

  test("dedup pipeline removes exact and near dups, keeps the rest") {
    val row = Registry.byName("q_dedup_pipeline").run(spark, sf).head()
    val total = Tables(spark, sf, "documents").count()
    val survivors = row.getLong(0)
    assert(survivors > 0 && survivors < total, s"$survivors of $total")
  }

  test("streaming upsert merges across micro-batches (later ts wins)") {
    val lake = s"${operators.Lakehouse.scratch}/spec_stream_upsert"
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(lake), true)
    implicit val ctx = spark.sqlContext
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val ms = MemoryStream[Ev]
    val q = ms.toDF().select("user_id", "ts", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch.groupBy("user_id")
          .agg(max_by(struct(col("ts"), col("value")), col("ts")).as("m"))
          .select(col("user_id"), col("m.ts").as("ts"), col("m.value").as("value"))
        if (LakeTable.currentVersion(spark, lake).isEmpty)
          LakeTable.create(spark, lake, latest)
        else {
          val winner = LakeTable.read(spark, lake).unionByName(latest)
            .groupBy("user_id")
            .agg(max_by(struct(col("ts"), col("value")), col("ts")).as("m"))
            .select(col("user_id"), col("m.ts").as("ts"), col("m.value").as("value"))
          LakeTable.merge(spark, lake, winner, "user_id")
        }
        ()
      }.outputMode(OutputMode.Update()).start()
    try {
      ms.addData(Ev(1, ts(0), 1, "a", 10.0), Ev(2, ts(1), 2, "a", 20.0))
      q.processAllAvailable()
      ms.addData(Ev(3, ts(5), 1, "a", 99.0), Ev(4, ts(0), 2, "a", 0.5)) // user2 update is OLDER
      q.processAllAvailable()
    } finally q.stop()
    val got = LakeTable.read(spark, lake).select("user_id", "value")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 99.0, 2L -> 20.0), got) // later ts wins, older loses
  }

  test("GraftExtensions exposes native functions to SQL at session build") {
    import spark.implicits._
    // SharedSpark builds through GraftSession → extensions applied; no
    // imperative registerSqlFunctions call has run in this JVM.
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64(array(CAST(7 AS BIGINT))) AS s").head().getLong(0)
    assert(sh == 7L) // single element: simhash = its own bits
  }

  test("approx-quantile rewrite fires only under the opt-in flag") {
    def plan() = Registry.byName("q_quantile").run(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan().contains("percentile(") && !plan().contains("approx"))
    spark.conf.set("spark.graft.approxQuantiles", "true")
    try {
      val p = plan()
      assert(p.contains("percentile_approx") || p.contains("approx_percentile"), p.take(800))
      // and results stay within sketch tolerance of exact
      val approx = Registry.byName("q_quantile").run(spark, sf).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      spark.conf.unset("spark.graft.approxQuantiles")
      val exact = Registry.byName("q_quantile").run(spark, sf).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, v) =>
        assert(math.abs(approx(k) - v) / v < 0.02, s"$k: ${approx(k)} vs $v") }
    } finally spark.conf.unset("spark.graft.approxQuantiles")
  }

  test("materialized rollup serves without scanning the fact table") {
    val df = Registry.byName("q_mv_rollup").run(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("orders.parquet"), "MV query must not rescan the fact table")
  }

  test("HLL rollup: sketch union is lossless and tracks exact distincts") {
    import org.apache.spark.sql.functions._
    val rolled = Registry.byName("q_hll_rollup").run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // union-of-daily-sketches == one sketch over all events (equal lgK)
    val direct = Tables(spark, sf, "events")
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == direct, s"rollup $rolled vs direct $direct")
    // and the estimate is a real estimate of the exact count
    val exact = Tables(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(rolled(k).toDouble - n) / n < 0.05, s"$k: ${rolled(k)} vs $n")
    }
  }
}
