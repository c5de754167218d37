package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin exposing a directory of LakeTables to text SQL —
  * the metastore capability of the reference platform
  * (internal/controller/metastore.go:38-44 manages the Hive Metastore
  * that Kyuubi sessions resolve names through): register with
  *
  * {{{
  *   spark.sql.catalog.graft_cat      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft_cat.root = /path/to/warehouse
  * }}}
  *
  * and `SELECT * FROM graft_cat.db.t`, `CREATE TABLE graft_cat.db.t
  * AS SELECT ...`, `DROP TABLE ...` work against LakeTable snapshots
  * with the V2 parquet scan/commit paths of GraftTable. Namespaces
  * are single-level directories under the root; table metadata IS the
  * LakeTable commit log, so the catalog is stateless and any number
  * of sessions (tenants) can share it concurrently — the commit
  * claim in LakeTable arbitrates writers.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  private def spark: SparkSession = org.apache.spark.sql.graftglue.Glue.activeSession
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def nsPath(namespace: Array[String]): Path =
    new Path((root +: namespace).mkString("/"))

  private def tablePath(ident: Identifier): Path =
    new Path((root +: ident.namespace() :+ ident.name()).mkString("/"))

  private def isLakeTable(p: Path): Boolean =
    LakeTable.currentVersion(spark, p.toString).isDefined

  // ---- namespaces -------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    val f = fs(r)
    if (!f.exists(r)) Array.empty
    else f.listStatus(r).filter(_.isDirectory).map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && fs(nsPath(namespace)).exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      Map("location" -> nsPath(namespace).toString).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespace.length != 1)
      throw new IllegalArgumentException("graft catalog namespaces are single-level")
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    fs(nsPath(namespace)).mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = nsPath(namespace)
    if (!cascade && fs(p).listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs(p).delete(p, true)
  }

  // ---- tables -----------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    val p = nsPath(namespace)
    fs(p).listStatus(p).filter(_.isDirectory)
      .filter(s => isLakeTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName)) ++
      GraftViews.list(spark, root, namespace) // Hive model: views list as tables
  }

  override def tableExists(ident: Identifier): Boolean =
    isLakeTable(tablePath(ident)) || GraftViews.exists(spark, root, ident)

  override def loadTable(ident: Identifier): Table = {
    // Stored views (B47) resolve as virtual tables: scans re-execute
    // the stored SQL (the Hive "view is a table object" model).
    if (GraftViews.exists(spark, root, ident)) {
      val (sql, schema) = GraftViews.load(spark, root, ident)
      return new GraftViewTable((ident.namespace() :+ ident.name()).mkString("."), sql, schema)
    }
    val p = tablePath(ident)
    if (!isLakeTable(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString, None, None)
  }

  /** SQL time travel: `SELECT ... FROM graft_cat.db.t VERSION AS OF n`
    * resolves a pinned LakeTable snapshot; a NON-numeric spec resolves
    * through the table's named tags (`VERSION AS OF 'stable'`).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = tablePath(ident)
    if (!isLakeTable(p)) throw new NoSuchTableException(ident)
    new GraftTable(p.toString,
      Some(LakeTable.resolveVersion(spark, p.toString, version)), None)
  }

  /** SQL time travel by wall clock: `... TIMESTAMP AS OF '...'` —
    * Spark hands the literal as MICROSECONDS since epoch; resolve the
    * newest commit at or before it (LakeTable.versionAt).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = tablePath(ident)
    if (!isLakeTable(p)) throw new NoSuchTableException(ident)
    val v = LakeTable.versionAt(org.apache.spark.sql.graftglue.Glue.activeSession, p.toString, timestamp / 1000L)
      .getOrElse(throw new NoSuchTableException(ident))
    new GraftTable(p.toString, Some(v), None)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partCols = partitions.toSeq.map { t =>
      if (t.name != "identity")
        throw new UnsupportedOperationException(s"unsupported partition transform $t")
      t.references().head.fieldNames().mkString(".")
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    LakeTable.create(spark, tablePath(ident).toString, empty, partCols)
    new GraftTable(tablePath(ident).toString, None, Option(schema))
  }

  /** ALTER TABLE ... ADD COLUMNS: a pure METADATA operation — the new
    * columns are recorded in the table meta and surface as NULL until
    * data lands (files are never rewritten, the lakehouse contract).
    * Everything else (renames, drops, type changes) still rejects:
    * those require rewriting or remapping data.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = tablePath(ident)
    if (!isLakeTable(p)) throw new NoSuchTableException(ident)
    val updated = changes.foldLeft(LakeTable.tableSchema(spark, p.toString)) {
      case (sch, add: TableChange.AddColumn) if add.fieldNames.length == 1 =>
        sch.add(add.fieldNames()(0), add.dataType(), nullable = true)
      case (_, other) => throw new UnsupportedOperationException(
        s"only ADD COLUMNS is a metadata-only change; got $other")
    }
    LakeTable.updateSchemaMeta(spark, p.toString, updated)
    new GraftTable(p.toString, None, Some(updated))
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (GraftViews.exists(spark, root, ident))
      return GraftViews.drop(spark, root, ident)
    val p = tablePath(ident)
    if (!isLakeTable(p)) false else fs(p).delete(p, true)
  }

  // ---- procedures (CALL graft_cat.system.<proc>, B44) -------------

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n))
    else Array.empty

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!fs(tablePath(oldIdent)).rename(tablePath(oldIdent), tablePath(newIdent)))
      throw new IllegalStateException(s"rename $oldIdent -> $newIdent failed")
  }
}
