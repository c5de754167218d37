package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column plan-agnostic (ColumnNode); the conversion
  * helpers live in `org.apache.spark.sql.classic` with `private[sql]`
  * visibility, so this one-file shim sits under org.apache.spark.sql
  * to re-export them for graft's native expressions (graft.plans.*).
  */
object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unload every cached state-store provider and stop the
    * maintenance task (they reload lazily on the next stateful
    * query). Spark's own streaming test suites do exactly this
    * between tests: in a long-lived single JVM, each stateful query
    * run leaves per-partition providers (and their on-heap map /
    * RocksDB caches) loaded until maintenance lazily evicts them —
    * accumulated across a 240-query bench they inflate later stream
    * rows' measurements with other queries' state. `StateStore` is
    * private[sql], hence this shim.
    */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()

  /** Connector literal over a Catalyst-internal value (UTF8String,
    * Int, …) — the shape BatchScanExec hands to runtime-filterable
    * scans; the case class is private[sql], hence this shim.
    */
  def connectorLiteral(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Expression =
    org.apache.spark.sql.connector.expressions.LiteralValue(v, dt)

  /** Wrap a LogicalPlan into a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Broadcast the driver's Hadoop configuration for executor-side
    * filesystem/footer access (SerializableConfiguration is
    * private[spark]).
    */
  def broadcastHadoopConf(sc: org.apache.spark.SparkContext)
      : org.apache.spark.broadcast.Broadcast[_ <: java.io.Serializable] =
    org.apache.spark.util.SerializableConfiguration.broadcast(sc)

  def confOf(b: org.apache.spark.broadcast.Broadcast[_]): org.apache.hadoop.conf.Configuration =
    b.value.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value

  /** The active CLASSIC session. The unified `SparkSession.active`
    * can resolve to a Spark Connect CLIENT session (which has no
    * SparkContext and throws on any engine-side use) when a connect
    * client ran in-process — engine code must bind to the classic
    * one.
    */
  def activeSession: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.classic.SparkSession.active

  /** The session-level Hadoop configuration WITH the SQL confs folded
    * in (what FileFormat writers expect to read their settings from).
    */
  def sessionHadoopConf(spark: org.apache.spark.sql.SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.newHadoopConf()

  /** Broadcast an arbitrary Hadoop configuration (the hadoopConf
    * overload of [[broadcastHadoopConf]]).
    */
  def broadcastConf(sc: org.apache.spark.SparkContext,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.broadcast.Broadcast[_ <: java.io.Serializable] =
    sc.broadcast(new org.apache.spark.util.SerializableConfiguration(conf))

  /** Task-side parquet writer for InternalRow — the piece a native
    * DSv2 DataWriter needs. Wires ParquetWriteSupport exactly as
    * ParquetFileFormat.prepareWrite does (schema + legacy-format +
    * timestamp-type + rebase keys, defensively defaulted when the
    * shipped conf lacks them) and opens Spark's own ParquetOutputWriter
    * at `file`, so the bytes written are indistinguishable from a
    * DataFrame parquet write.
    */
  def parquetRowWriter(file: String, dataSchema: org.apache.spark.sql.types.StructType,
      conf: org.apache.hadoop.conf.Configuration)
      : org.apache.spark.sql.execution.datasources.OutputWriter = {
    import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType, JobID}
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    import org.apache.parquet.hadoop.ParquetOutputFormat
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val c = new org.apache.hadoop.conf.Configuration(conf)
    ParquetWriteSupport.setSchema(dataSchema, c)
    c.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS, classOf[ParquetWriteSupport].getName)
    // ParquetWriteSupport.init / SparkToParquetSchemaConverter read
    // these SQLConf entries from the Hadoop conf with no fallback;
    // default any the shipped session conf didn't carry explicitly.
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_REBASE_MODE_IN_WRITE,
      SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => c.setIfUnset(e.key, e.defaultValueString))
    c.setIfUnset(ParquetOutputFormat.COMPRESSION, "snappy")
    val attempt = new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP, 0), 0)
    new ParquetOutputWriter(file, new TaskAttemptContextImpl(c, attempt))
  }

  /** Parse + analyze a SQL boolean expression against `schema` and
    * return it BOUND by ordinal — a serializable Expression a task can
    * wrap in `Predicate.create` for per-row evaluation (the CHECK
    * constraint enforcement path of the native graft write).
    */
  def boundExpression(spark: org.apache.spark.sql.SparkSession, sql: String,
      schema: org.apache.spark.sql.types.StructType): Expression = {
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parsed = classic.sessionState.sqlParser.parseExpression(sql)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val analyzed = classic.sessionState.analyzer.execute(Filter(parsed, LocalRelation(attrs)))
      .asInstanceOf[Filter]
    BindReferences.bindReference(analyzed.condition, analyzed.child.output)
  }

  /** Hive-style partition-path escaping (matches what
    * DataFrameWriter.partitionBy produces, so natively-written and
    * API-written partition dirs interoperate).
    */
  def escapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)

  /** Register a builder under `name` in the session's function
    * registry so TEXT SQL can call graft's native expressions.
    * Idempotent (createOrReplace).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** ONE DataFrame over EXPLICIT partition metadata spanning MANY file
    * groups — the API-read twin of [[partitionedParquetScanBuilder]]:
    * the caller supplies (partition values → leaf dir) pairs it
    * already knows from the commit log, partition discovery is
    * skipped, and the whole multi-group snapshot reads as a SINGLE
    * HadoopFsRelation scan (pushdown, pruning, vectorized, partition
    * pruning against the supplied spec). The data schema is merged
    * from the parquet footers in ONE distributed job (the same
    * mergeSchema mechanics, but once for the table instead of once
    * per file group). None when the leaves hold no parquet footers
    * (an empty partitioned create) — the caller falls back.
    */
  def partitionedParquetDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      leaves: Seq[(Seq[Option[String]], org.apache.hadoop.fs.Path)],
      partitionSchema: org.apache.spark.sql.types.StructType,
      mergedHint: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.types.StructType)] = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.types.StructType
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = explicitPartitionIndex(classic, leaves, partitionSchema, None)
    val fmt = new ParquetFileFormat
    val opts = Map("mergeSchema" -> "true")
    // `mergedHint` (a caller-side cache of this very computation for
    // the same immutable snapshot) skips the footer-merge job.
    mergedHint.orElse(fmt.inferSchema(classic, opts, index.allFiles())).map { merged =>
      val dataSchema = StructType(
        merged.filterNot(f => partitionSchema.fieldNames.contains(f.name)))
      (classic.baseRelationToDataFrame(HadoopFsRelation(
        index, partitionSchema, dataSchema, None, fmt, opts)(classic)), merged)
    }
  }

  private def explicitPartitionIndex(
      classic: org.apache.spark.sql.classic.SparkSession,
      leaves: Seq[(Seq[Option[String]], org.apache.hadoop.fs.Path)],
      partitionSchema: org.apache.spark.sql.types.StructType,
      dataSchema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.execution.datasources.InMemoryFileIndex = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionPath, PartitionSpec}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val tz = classic.sessionState.conf.sessionLocalTimeZone
    val paths = leaves.map { case (values, dir) =>
      val row = InternalRow.fromSeq(values.zip(partitionSchema.fields).map {
        case (None, _) => null
        case (Some(raw), f) =>
          Cast(Literal(UTF8String.fromString(raw), StringType), f.dataType,
            Some(tz)).eval(null)
      })
      PartitionPath(row, dir)
    }
    new InMemoryFileIndex(classic, paths.map(_.path),
      Map("mergeSchema" -> "true"), dataSchema,
      FileStatusCache.getOrCreate(classic),
      Some(PartitionSpec(partitionSchema, paths)), None)
  }

  /** Parquet V2 scan builder over EXPLICIT partition metadata — the
    * Hive-conversion pattern (CatalogFileIndex): Spark's own partition
    * DISCOVERY requires all partitioned files to share one base path,
    * which a multi-file-group lakehouse table cannot satisfy, so the
    * caller supplies the (partition values → leaf dir) spec it already
    * knows from its layout and discovery is skipped entirely. Returns
    * a ScanBuilder identical in capability to ParquetTable's
    * (pushdown, pruning, vectorized read, partition pruning against
    * the provided spec).
    *
    * `leaves`: (partition values matching partitionSchema order, leaf
    * dir) — raw string values, cast here; None = null partition.
    */
  def partitionedParquetScanBuilder(
      spark: org.apache.spark.sql.SparkSession,
      leaves: Seq[(Seq[Option[String]], org.apache.hadoop.fs.Path)],
      partitionSchema: org.apache.spark.sql.types.StructType,
      fullSchema: org.apache.spark.sql.types.StructType,
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder
        with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns = {
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
    import org.apache.spark.sql.types.StructType
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val dataSchema = StructType(
      fullSchema.filterNot(f => partitionSchema.fieldNames.contains(f.name)))
    val index = explicitPartitionIndex(classic, leaves, partitionSchema, Some(dataSchema))
    ParquetScanBuilder(classic, index, fullSchema, dataSchema, options)
  }
}
