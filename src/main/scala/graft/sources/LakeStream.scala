package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Commit-log-driven streaming source over a LakeTable — the
  * log-aware upgrade of [[LakeTable.streamAppends]]: offsets are
  * TABLE VERSIONS, each micro-batch reads exactly the file groups the
  * commits in (start, end] added, and a non-append commit (merge /
  * delete / compact / cluster) FAILS the stream instead of silently
  * replaying rewritten rows — the Delta streaming-source contract.
  * Orphaned racer dirs (staged but never committed) are invisible
  * because batches are planned from the log, never from a glob.
  *
  * Reading delegates to Spark's own parquet V2 machinery: each batch
  * plans `FilePartition`s through a ParquetTable scan over the added
  * dirs, and the stream's reader factory is parquet's vectorized
  * factory — no custom row decoding.
  */
final case class LakeVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

final class LakeMicroBatchStream(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private def current: Long = LakeTable.currentVersion(spark, path)
    .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))

  private def innerBatch(dirPaths: Seq[String]): Batch =
    ParquetTable(s"graft.`$path`", spark, options, dirPaths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options).build().toBatch

  /** Dirs the commits in (fromExclusive, toInclusive] added, with the
    * append-only contract enforced per commit.
    */
  private def addedDirs(fromExclusive: Long, toInclusive: Long): Seq[String] = {
    // A checkpointed version may have been vacuumed away since the
    // stream last ran — surface that as actionable state, not a raw
    // FileNotFoundException from the log read.
    def commitOf(v: Long): LakeTable.Commit =
      try LakeTable.readCommit(spark, path, v)
      catch {
        case e: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"commit v$v of streamed LakeTable $path no longer exists " +
              "(vacuumed past the checkpointed offset?) — " +
              "restart the stream from a fresh checkpoint", e)
      }
    val added = Seq.newBuilder[String]
    var prev: Set[String] =
      if (fromExclusive < 0) Set.empty
      else commitOf(fromExclusive).dirs.toSet
    ((fromExclusive + 1) to toInclusive).foreach { v =>
      val c = commitOf(v)
      val ok = c.action == "create" || c.action == "append" || c.action == "clone"
      val removed = prev -- c.dirs.toSet
      if (!ok || removed.nonEmpty)
        throw new IllegalStateException(
          s"streamed LakeTable $path changed non-append at v$v (${c.action}); " +
            "a rewrite would replay rows — stream from a fresh checkpoint instead")
      added ++= c.dirs.filterNot(prev)
      prev = c.dirs.toSet
    }
    added.result()
  }

  override def initialOffset(): Offset = LakeVersionOffset(-1L)
  override def latestOffset(): Offset = LakeVersionOffset(current)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeVersionOffset].version
    val e = end.asInstanceOf[LakeVersionOffset].version
    if (e <= s) return Array.empty
    val dirs = addedDirs(s, e).map(d => new Path(path, d).toString)
    if (dirs.isEmpty) Array.empty else innerBatch(dirs).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Parquet's factory is bound to schema/conf, not to a file list —
    // one factory serves every batch's FilePartitions.
    val c = LakeTable.readCommit(spark, path, current)
    innerBatch(c.dirs.map(d => new Path(path, d).toString)).createReaderFactory()
  }

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(""""version"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json).getOrElse(
      throw new IllegalStateException(
        s"malformed graft offset '$json' in the checkpoint for $path — " +
          "restart the stream from a fresh checkpoint")).group(1).toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Streaming (and batch) read of the PERSISTED change feed
  * (`LakeTable.enableCdc` + change files under `_cdc/`): offsets are
  * table versions, each micro-batch is a parquet scan of exactly the
  * change files the commits in (start, end] published — never a diff
  * join at read time. Commits without a cdc entry (pre-enablement
  * history, compaction/clustering rewrites, pruned no-op DML)
  * contribute no rows, so layout maintenance never disturbs the feed —
  * unlike the data-dir source above, which must REJECT rewrites.
  * Replaying a checkpointed range re-reads the same immutable files:
  * exactly-once across restarts comes from version offsets alone.
  */
final class LakeCdcMicroBatchStream(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap,
    pushed: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
    prunedSchema: Option[StructType] = None) extends MicroBatchStream {

  private def current: Long = LakeTable.currentVersion(spark, path)
    .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))

  // Replays the query's negotiated pushdown per micro-batch, so a
  // filtered/projected streaming read of the feed scans change files
  // with the same parquet-level pruning a batch read gets.
  private def innerBatch(dirPaths: Seq[String]): Batch = {
    val b = ParquetTable(s"graft-cdc.`$path`", spark, options, dirPaths, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
    if (pushed.nonEmpty) b.pushFilters(pushed)
    prunedSchema.foreach(b.pruneColumns)
    b.build().toBatch
  }

  override def initialOffset(): Offset = LakeVersionOffset(-1L)
  override def latestOffset(): Offset = LakeVersionOffset(current)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LakeVersionOffset].version
    val e = end.asInstanceOf[LakeVersionOffset].version
    if (e <= s) return Array.empty
    val dirs = LakeTable.cdcDirsBetween(spark, path, s, e)
    if (dirs.isEmpty) Array.empty else innerBatch(dirs).planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    innerBatch(LakeTable.cdcDirsBetween(spark, path, -1L, current))
      .createReaderFactory()

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(""""version"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json).getOrElse(
      throw new IllegalStateException(
        s"malformed graft-cdc offset '$json' for $path — " +
          "delete the checkpoint to restart the feed")).group(1).toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Scan for the change feed: batch delegates to the (possibly dir-
  * pruned, filter-pushed) inner parquet scan; streaming replays the
  * same pushdown through [[LakeCdcMicroBatchStream]].
  */
final class GraftCdcScan(inner: Scan, spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap,
    pushed: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    prunedSchema: Option[StructType]) extends Scan {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def description(): String = inner.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode = inner.columnarSupportMode()
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeCdcMicroBatchStream(spark, path, schema, options, pushed, prunedSchema)
}

/** Scan builder for the change feed: delegates filter pushdown and
  * column pruning to Spark's parquet builder, and additionally mines
  * `_commit_version` bounds from the pushed conjuncts to skip WHOLE
  * change-file dirs (dir ↔ version is known from the log, so a
  * "changes since v" query never opens older change files at all).
  */
final class GraftCdcScanBuilder(spark: SparkSession, path: String,
    schema: StructType, options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}

  private val cur = LakeTable.currentVersion(spark, path)
    .getOrElse(throw new IllegalArgumentException(s"no LakeTable at $path"))

  private def mkInner(dirs: Seq[String]) =
    ParquetTable(s"graft-cdc.`$path`", spark, options, dirs, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)

  private val probe = mkInner(LakeTable.cdcDirsBetween(spark, path, -1L, cur))
  private var pushed: Seq[Expression] = Nil
  private var prunedSchema: Option[StructType] = None

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    probe.pushFilters(filters)
  }
  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    probe.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit = {
    prunedSchema = Some(requiredSchema)
    probe.pruneColumns(requiredSchema)
  }

  /** Inclusive [lo, hi] on `_commit_version` from top-level conjuncts. */
  private def versionRange(): (Long, Long) = {
    var lo = 0L; var hi = cur
    def lit(e: Expression): Option[Long] = e match {
      case Literal(n: Number, _) => Some(n.longValue())
      case _ => None
    }
    def isV(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "_commit_version"
      case _ => false
    }
    def walk(e: Expression): Unit = e match {
      case CAnd(l, r) => walk(l); walk(r)
      case EqualTo(a, l) if isV(a) => lit(l).foreach { v => lo = lo.max(v); hi = hi.min(v) }
      case EqualTo(l, a) if isV(a) => lit(l).foreach { v => lo = lo.max(v); hi = hi.min(v) }
      case GreaterThan(a, l) if isV(a) => lit(l).foreach(v => lo = lo.max(v + 1))
      case GreaterThanOrEqual(a, l) if isV(a) => lit(l).foreach(v => lo = lo.max(v))
      case LessThan(a, l) if isV(a) => lit(l).foreach(v => hi = hi.min(v - 1))
      case LessThanOrEqual(a, l) if isV(a) => lit(l).foreach(v => hi = hi.min(v))
      case GreaterThan(l, a) if isV(a) => lit(l).foreach(v => hi = hi.min(v - 1))
      case GreaterThanOrEqual(l, a) if isV(a) => lit(l).foreach(v => hi = hi.min(v))
      case LessThan(l, a) if isV(a) => lit(l).foreach(v => lo = lo.max(v + 1))
      case LessThanOrEqual(l, a) if isV(a) => lit(l).foreach(v => lo = lo.max(v))
      case _ => ()
    }
    pushed.foreach(walk)
    (lo, hi)
  }

  override def build(): Scan = {
    val (lo, hi) = versionRange()
    val dirs = LakeTable.cdcDirsBetween(spark, path, lo - 1, hi.min(cur))
    val inner = mkInner(dirs)
    if (pushed.nonEmpty) inner.pushFilters(pushed)
    prunedSchema.foreach(inner.pruneColumns)
    new GraftCdcScan(inner.build(), spark, path, schema, options, pushed, prunedSchema)
  }
}

/** Scan wrapper: batch behavior delegates untouched to the inner
  * parquet V2 scan; streaming resolves to the commit-log micro-batch
  * stream above.
  */
final class GraftStreamableScan(val inner: Scan, spark: SparkSession, val path: String,
    schema: StructType, options: CaseInsensitiveStringMap) extends Scan {
  // Identity delegates to (inner, path): the wrapped ParquetScan is a
  // case class that canonicalizes structurally, and reference equality
  // here would defeat the planner's scan/exchange reuse when one query
  // scans the same graft table twice.
  override def equals(other: Any): Boolean = other match {
    case g: GraftStreamableScan => inner == g.inner && path == g.path
    case _ => false
  }
  override def hashCode(): Int = 31 * inner.hashCode() + path.hashCode
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def description(): String = inner.description()
  override def columnarSupportMode(): Scan.ColumnarSupportMode = inner.columnarSupportMode()
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeMicroBatchStream(spark, path, schema, options)
}
