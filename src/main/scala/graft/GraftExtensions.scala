package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{CosineSimilarity, HyperplaneSketch, MinHashSignature, SimHash64}

/** Session extension wiring graft's native expressions into every new
  * session's function registry — the deployment path for a cluster:
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions`, as GraftSession does). SQL users then
  * call `cosine_sim`, `minhash_sig`, `simhash64`, `hyperplane_sketch`
  * directly; the same registration is also available imperatively via
  * `functions.Vectors.registerSqlFunctions` for sessions graft didn't
  * build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval().toString.toInt
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Catalog views inline into the consuming plan (Iceberg-style):
    // predicates/pruning reach the base scans instead of stopping at a
    // row-RDD view boundary.
    ext.injectResolutionRule(session => graft.plans.GraftViewInline(session))
    // Row filters / column masks rewrite policy-bearing relations at
    // analysis time (fine-grained access control, C27).
    ext.injectResolutionRule(session => graft.plans.GraftRowPolicy(session))
    ext.injectOptimizerRule(session => graft.plans.ApproxQuantileRewrite(session))
    ext.injectOptimizerRule(session => graft.plans.MaterializedViewRewrite(session))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // SQL UPDATE / MERGE INTO over graft catalog tables → granular COW
    // (post-hoc: runs on the fully resolved statement, before checks).
    ext.injectPostHocResolutionRule(session => graft.plans.GraftRowLevelSql(session))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<bigint>, k) - k-permutation MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args(0), intArg(args(1)))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<bigint>) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("hyperplane_sketch"),
      info("hyperplane_sketch", "hyperplane_sketch(array<float>, tables, bits, dim) - LSH bucket keys"),
      (args: Seq[Expression]) =>
        HyperplaneSketch(args(0), intArg(args(1)), intArg(args(2)), intArg(args(3)))))

    // ---- table-valued functions: lakehouse metadata surfaces in pure
    // SQL (the Delta `DESCRIBE HISTORY` / `table_changes(...)` UX).
    // The plan is built at resolution time — both read only table
    // METADATA (commit log) or plan a change-file scan; neither
    // materializes data eagerly beyond the log.
    ext.injectTableFunction((FunctionIdentifier("graft_history"),
      info("graft_history",
        "graft_history('db.table' | '/table/path') - commit audit log, newest first"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.graftglue.Glue.activeSession
        analyzedPlan(graft.sources.LakeTable.history(spark,
          resolveTarget(spark, stringArg(args.head))))
      }))
    ext.injectTableFunction((FunctionIdentifier("graft_files"),
      info("graft_files",
        "graft_files('db.table' | '/table/path') - live data files of the current snapshot"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.graftglue.Glue.activeSession
        analyzedPlan(graft.sources.LakeTable.filesDf(spark,
          resolveTarget(spark, stringArg(args.head))))
      }))
    ext.injectTableFunction((FunctionIdentifier("graft_changes"),
      info("graft_changes",
        "graft_changes(target[, fromExclusive[, toInclusive]]) - the CDC feed as a table"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.graftglue.Glue.activeSession
        val target = resolveTarget(spark, stringArg(args.head))
        val from = args.lift(1).map(longArg).getOrElse(-1L)
        val to = args.lift(2).map(longArg).getOrElse(Long.MinValue)
        analyzedPlan(graft.sources.LakeTable.readChangeFeed(spark, target, from, to))
      }))
  }

  private def stringArg(e: Expression): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case s: String => s
    case other => throw new IllegalArgumentException(
      s"expected a string literal argument, got $other")
  }

  private def longArg(e: Expression): Long = e.eval() match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  /** `db.table` resolves under the graft_cat warehouse root; anything
    * with a '/' is a filesystem path used as-is. Both forms pass the
    * authorization gate: the history/CDC surfaces expose table rows
    * (change feeds carry full pre/post images), so they need the same
    * SELECT a direct read needs — and raw paths stay closed to remote
    * tenants, like every other path surface.
    */
  private def resolveTarget(spark: org.apache.spark.sql.SparkSession, s: String): String =
    if (s.contains("/")) {
      graft.GraftAuthz.guardPathAccess(spark, s)
      s
    } else {
      val parts = s.split("\\.").toSeq
      if (parts.length >= 2)
        graft.GraftAuthz.requireSelect(spark, parts.init.mkString("."), parts.last)
      val root = spark.conf.getOption("spark.sql.catalog.graft_cat.root")
        .getOrElse(throw new IllegalArgumentException(
          s"'$s' is not a path and no graft_cat catalog root is configured"))
      (root +: parts).mkString("/")
    }

  private def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
