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
    oracle: Option[String] = None)

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
      streaming.EventPipeline.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
