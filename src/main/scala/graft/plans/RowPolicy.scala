package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.GraftAuthz
import graft.sources.GraftTable

/** Fine-grained access control at ANALYSIS time — the Databricks /
  * Ranger row-filter + column-mask capability on top of the C24 grant
  * model: when the acting principal has policies on a catalog table,
  * its relation is rewritten to
  *
  * {{{ Project(masked outputs, Filter(rowFilter, relation)) }}}
  *
  * so EVERY read surface (SQL, DataFrame, views — which inline to
  * relations — joins, subqueries, CTAS sources) serves the restricted
  * view of the data. The filter evaluates below the masks (policies
  * see raw values, the standard semantics); mask expressions cast to
  * the column's declared type and keep the original exprIds so outer
  * references stay bound (the GraftViewInline aliasing pattern).
  *
  * Write stance: a principal with ANY policy on a table loses write
  * access to it — a row you cannot see must not be updatable or
  * deletable, and Spark's write plans cannot carry a filtered
  * relation. Write/DML targets are detected by identity before the
  * rewrite and rejected outright; the relation handle is also marked
  * write-denied so the row-level SQL rule and DSv2 writes reject on
  * their own paths.
  *
  * Superusers and sessions without enforcement see no rewrite at all.
  */
case class GraftRowPolicy(spark: SparkSession) extends Rule[LogicalPlan] {

  private def eligible(r: DataSourceV2Relation): Boolean =
    r.table.isInstanceOf[GraftTable] && r.identifier.isDefined &&
      !r.table.asInstanceOf[GraftTable].policyChecked

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!GraftAuthz.required) return plan
    // Relations in WRITE-TARGET position (identity, not equality — the
    // same table can legitimately appear as a read elsewhere in the
    // statement, e.g. MERGE INTO t USING t).
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataSourceV2Relation, java.lang.Boolean]())
    def collectTargets(p: LogicalPlan): Unit = p.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r)
      case _ => ()
    }
    plan.foreach {
      case w: V2WriteCommand => collectTargets(w.table)
      case u: UpdateTable => collectTargets(u.table)
      case m: MergeIntoTable => collectTargets(m.targetTable)
      case d: DeleteFromTable => collectTargets(d.table)
      case _ => ()
    }
    plan.resolveOperators {
      case r: DataSourceV2Relation if eligible(r) =>
        val t = r.table.asInstanceOf[GraftTable]
        val ident = r.identifier.get
        val pol = GraftAuthz.policiesFor(spark,
          ident.namespace().mkString("."), ident.name())
        t.policyChecked = true
        if (pol.isEmpty) r
        else {
          val who = graft.GraftAuthIdentity.current(spark)
          if (writeTargets.contains(r))
            throw new GraftAuthz.AccessDenied(
              s"PERMISSION_DENIED: row/column policies make table " +
                s"'${ident.namespace().mkString(".")}.${ident.name()}' read-only " +
                s"for principal '$who'")
          t.denyWritesFor(who)
          val parser = spark.sessionState.sqlParser
          if (pol.masks.isEmpty)
            // Filter passes attributes through, so the original
            // relation serves directly — no id juggling needed.
            Filter(parser.parseExpression(pol.rowFilter.get), r)
          else {
            // The mask Project must NOT look like a no-op projection
            // of its child (same output ids ⇒ the optimizer removes
            // it): re-instance the relation with FRESH attribute ids
            // and alias every column back to the ORIGINAL ids, so
            // outer references stay bound while the Project's output
            // provably differs from its child's (the GraftViewInline
            // aliasing pattern).
            val fresh = r.newInstance()
            val filtered = pol.rowFilter.fold[LogicalPlan](fresh)(sql =>
              Filter(parser.parseExpression(sql), fresh))
            val byName = fresh.output.map(a => a.name -> a).toMap
            val outputs: Seq[NamedExpression] = r.output.map { a =>
              val src = byName(a.name)
              val e = pol.masks.get(a.name) match {
                case Some(maskSql) =>
                  Cast(parser.parseExpression(maskSql), a.dataType,
                    Some(spark.sessionState.conf.sessionLocalTimeZone))
                case None => src
              }
              Alias(e, a.name)(exprId = a.exprId, qualifier = a.qualifier)
            }
            Project(outputs, filtered)
          }
        }
    }
  }
}
