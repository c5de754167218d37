package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 Table over a LakeTable path. Reads delegate to Spark's
  * own ParquetTable scan builder over the snapshot's file-group dirs,
  * so the scan IS a parquet V2 scan: filter pushdown, column pruning,
  * vectorized columnar batches and whole-stage codegen — none of the
  * per-row InternalRow→Row deserialization the V1 PrunedFilteredScan
  * path paid at the relation boundary. Writes use the sanctioned
  * V1Write fallback (toInsertableRelation → LakeTable create/append),
  * which keeps the commit protocol in one place.
  *
  * ACCEPT_ANY_SCHEMA: LakeTable supports per-group schema evolution
  * (mergeSchema read), so Spark's by-name write validation is left to
  * the table itself — same stance as other lakehouse connectors.
  *
  * Reference capability: named tables over object storage via a
  * metastore (internal/controller/metastore.go:38-44); the catalog
  * plugin in GraftCatalog.scala builds on this Table.
  */
final class GraftTable(path: String, version: Option[Long],
    providedSchema: Option[StructType]) extends Table
    with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = s"graft.`$path`" + version.map(v => s"@v$v").getOrElse("")

  override def schema(): StructType =
    providedSchema.filter(_.nonEmpty).getOrElse {
      if (LakeTable.currentVersion(spark, path).isDefined)
        LakeTable.read(spark, path, version).schema
      else new StructType() // not-yet-created target of a first write
    }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      // BATCH_WRITE routes DataFrameWriter through the V2 plan;
      // V1_BATCH_WRITE tells execution the Write is a V1 fallback.
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = Option(options.get("version")).map(_.toLong).orElse(version)
      .orElse(LakeTable.currentVersion(spark, path))
      .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))
    val commit = LakeTable.readCommit(spark, path, v)
    val dirs = commit.dirs.map(d => new Path(path, d).toString)
    val scanOpts = new CaseInsensitiveStringMap(
      (options.asCaseSensitiveMap().asScala.toMap ++ Map("mergeSchema" -> "true")).asJava)
    ParquetTable(name(), spark, scanOpts, dirs,
      Some(LakeTable.read(spark, path, Some(v)).schema), classOf[ParquetFileFormat])
      .newScanBuilder(scanOpts)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit = {
              val exists = LakeTable.currentVersion(data.sparkSession, path).isDefined
              if (overwrite || overwriteFlag || !exists)
                LakeTable.create(data.sparkSession, path, data)
              else LakeTable.append(data.sparkSession, path, data)
            }
          }
      }
    }
}
