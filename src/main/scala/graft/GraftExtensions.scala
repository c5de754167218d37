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
  }
}
