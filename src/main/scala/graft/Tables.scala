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
