package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` integration for LakeTable — the
  * data-source registration path (DataSource API with pruned +
  * filtered scans; filters and column pruning are forwarded into the
  * underlying parquet scan, so PushedFilters/ReadSchema behave as for
  * a direct read). Options: `path` (required), `version` (optional
  * time travel). Writing with `.format("graft").save(path)` creates
  * version 0 or appends per SaveMode.
  */
class DefaultSource extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val version = parameters.get("version").map(_.toLong)
    GraftRelation(ctx, pathOf(parameters), version)
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val exists = LakeTable.currentVersion(ctx.sparkSession, path).isDefined
    mode match {
      case SaveMode.Overwrite => LakeTable.create(ctx.sparkSession, path, data)
      case SaveMode.Append if exists => LakeTable.append(ctx.sparkSession, path, data)
      case SaveMode.Append => LakeTable.create(ctx.sparkSession, path, data)
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"LakeTable already exists at $path")
      case SaveMode.ErrorIfExists => LakeTable.create(ctx.sparkSession, path, data)
      case SaveMode.Ignore if exists => ()
      case SaveMode.Ignore => LakeTable.create(ctx.sparkSession, path, data)
    }
    GraftRelation(ctx, path, None)
  }
}

final case class GraftRelation(ctx: SQLContext, path: String, version: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private def snapshot: DataFrame = LakeTable.read(ctx.sparkSession, path, version)

  override def sqlContext: SQLContext = ctx

  override lazy val schema: StructType = snapshot.schema

  /** Delegate to the DataFrame plan: requiredColumns become a select
    * (column pruning reaches parquet) and filters are re-expressed as
    * Column predicates (predicate pushdown reaches parquet). Filters
    * we translate are fully applied, so all are marked handled.
    */
  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    import org.apache.spark.sql.functions.col
    val filtered = filters.foldLeft(snapshot)((df, f) => toPredicate(f) match {
      case Some(c) => df.where(c)
      case None => df
    })
    val pruned =
      if (requiredColumns.isEmpty) filtered else filtered.select(requiredColumns.map(col): _*)
    pruned.rdd
  }

  private def toPredicate(f: Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case And(l, r) => for (lc <- toPredicate(l); rc <- toPredicate(r)) yield lc && rc
      case Or(l, r) => for (lc <- toPredicate(l); rc <- toPredicate(r)) yield lc || rc
      case Not(c) => toPredicate(c).map(!_)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case StringEndsWith(a, v) => Some(col(a).endsWith(v))
      case StringContains(a, v) => Some(col(a).contains(v))
      case _ => None
    }
  }
}
