package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated lakehouse tables (TESTDATA.md).
  *
  * Mirrors the surface a nineinfra NineCluster exposes through Kyuubi:
  * Spark SQL over parquet tables on object storage (reference:
  * internal/controller/kyuubi.go:92-124 wires Spark to s3a;
  * api/v1alpha1/ninecluster_types.go:29 `DataHouseDir`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fan an UNDER-SPLIT scan out to the cluster before CPU-heavy
    * per-row work (shingle hashing, JSON/variant parsing, media
    * decode, BPE encode, pairwise-cosine verification blocks).
    *
    * Why: a parquet row group is the minimum split unit, so a table
    * that arrives as one file with one row group scans as ONE task —
    * every expression before the first exchange then runs on a single
    * core no matter how many the cluster has (the "input skew /
    * unsplittable file" case, optimization guide §2.5; measured at
    * sf0.1: the whole D-block's shingle/token hashing was
    * single-threaded on local[32]). The fix the guide prescribes is a
    * repartition immediately after the read, BEFORE the heavy map.
    *
    * Scale-adaptive by construction: a no-op whenever the scan already
    * carries >= defaultParallelism partitions — the 100 TB case, where
    * the input arrives as thousands of row groups and this repartition
    * would be a full shuffle of the payload for nothing. The shuffle
    * it does insert on deficient inputs moves only the projected
    * columns of a scan that is by definition small (it fit in fewer
    * row groups than the cluster has cores).
    *
    * Use ONLY where downstream aggregation is order-insensitive
    * (integer-exact sums/counts, min/max, per-row maps, bounded-heap
    * top-k): re-bucketing rows changes partial-aggregation grouping,
    * which can flip the last ULP of a summed DOUBLE.
    */
  def fan(df: DataFrame): DataFrame = {
    // Kill switch (default on): lets a deployment pin the raw scan
    // layout, and lets the A/B bench time both variants in one JVM.
    if (df.sparkSession.conf.get("spark.graft.fan.enabled", "true") != "true") return df
    // SCAN-SHAPED INPUTS ONLY: under AQE, .rdd on a plan containing an
    // Exchange materializes every upstream query stage just to count
    // partitions, and the repartition then re-executes them. AQE wraps
    // a plan in AdaptiveSparkPlanExec exactly when it carries an
    // exchange or subquery, so that wrapper IS the "not a plain scan
    // subtree" signal — bail out and leave the input untouched (every
    // legitimate fan site is a scan/project/filter/union-of-scans,
    // which stays a plain plan).
    if (df.queryExecution.executedPlan
        .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec])
      return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val cur = try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => target }
    if (cur >= target) df else df.repartition(target)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark only
    // reads as a long (SPARK-40819). Values are µs-aligned, so the
    // ns→µs rescale below is lossless.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else acc
    }
  }
}
