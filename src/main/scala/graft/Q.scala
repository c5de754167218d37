package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark-native query plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle used by the
  * driver's correctness gate. `oracle` column names/types must match
  * the Spark result exactly (driver sorts columns by name, hashes
  * values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    setup: Option[(SparkSession, String) => Unit] = None,
    verb: Option[(SparkSession, String) => DataFrame] = None)

object Q {
  /** A staged capability: `setup` stages table state, `verb` is the
    * operator being claimed. `run` (the driver's correctness
    * contract) stays self-contained — setup then verb — while Bench
    * re-stages before EACH timed iteration and times only the verb,
    * so a benched "point lookup" measures the lookup, not the
    * 16-way range write + stats harvest that staged it (round-4
    * advice 3b).
    */
  def staged(name: String,
      setup: (SparkSession, String) => Unit,
      verb: (SparkSession, String) => DataFrame,
      oracle: Option[String] = None): Q =
    Q(name, (s, d) => { setup(s, d); verb(s, d) }, oracle, Some(setup), Some(verb))
}

object Registry {
  lazy val all: Seq[Q] =
    operators.RelationalCore.qs ++
      operators.RelationalAdvanced.qs ++
      operators.Events.qs ++
      operators.TextOps.qs ++
      operators.DedupOps.qs ++
      operators.SimilarityOps.qs ++
      operators.CustomJoins.qs ++
      operators.Lakehouse.qs ++
      operators.Multimodal.qs ++
      operators.Extras.qs ++
      operators.SqlSurface.qs ++
      operators.Clustering.qs ++
      operators.Curation.qs ++
      operators.OracleBounds.qs ++
      streaming.EventPipeline.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
