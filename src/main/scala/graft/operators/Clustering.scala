package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors => MlVectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Vectors

/** IVF-style ANN (coarse k-means quantizer + cell probing) and
  * connected-components clustering of near-dup pairs — the two
  * remaining pieces of a production-scale similarity stack.
  */
object Clustering {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** D16: IVF ANN. Train a k-cell coarse quantizer (seeded KMeans on
    * the corpus), assign corpus vectors to cells, then answer each
    * query by scanning only its `nprobe` nearest cells. At 100 TB the
    * quantizer trains on a sample, the assignment is one map pass,
    * and each query touches nprobe/k of the corpus.
    */
  def knnIvf(s: SparkSession, d: String, k: Int = 16, nprobe: Int = 4, topK: Int = 3): DataFrame = {
    import s.implicits._
    val emb = t(s, d, "embeddings")
    val corpus = emb.where(col("vec_id") >= 10).select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

    // The coarse quantizer only needs O(1000·k) points to converge —
    // train on a bounded sample, never the full corpus (at 100 TB a
    // full-corpus fit would be a quantizer trained with 10^9× more
    // data than it can use). Deterministic seed keeps it reproducible;
    // below the cap the sample is the whole corpus, unchanged results.
    // The ml.Vector conversion UDF only ever touches this bounded
    // sample — the corpus-wide paths below are all native codegen.
    val trainCap = 100000L
    val n = corpus.count()
    val sampled = if (n <= trainCap) corpus
      else corpus.sample(withReplacement = false, trainCap.toDouble / n, 42L)
    val toMl = udf((a: Seq[Float]) => MlVectors.dense(a.map(_.toDouble).toArray))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .fit(sampled.withColumn("features", toMl(col("embedding"))))
    val centroidRows: Array[Array[Float]] =
      model.clusterCenters.map(_.toArray.map(_.toFloat))
    val centroids: Array[(Int, Array[Float])] =
      centroidRows.zipWithIndex.map { case (c, i) => (i, c) }

    // Corpus → cell assignment: one shuffle-free map pass through the
    // native NearestCentroid expression (same squared-euclidean
    // first-min rule as model.transform, minus its row-by-row
    // Vector-conversion UDF boundary).
    val assigned = corpus
      .withColumn("cell", Vectors.nearestCentroid(col("embedding"), centroidRows))

    // Each query probes its nprobe nearest centroids.
    val centDf = centroids.toSeq.toDF("cell", "centroid")
    val probeW = Window.partitionBy("qid").orderBy(desc("csim"), col("cell"))
    val probes = queries.crossJoin(broadcast(centDf))
      .withColumn("csim", Vectors.cosineSim(col("qe"), col("centroid")))
      .withColumn("prn", row_number().over(probeW))
      .where(col("prn") <= nprobe)
      .select("qid", "qe", "cell")

    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("sim", Vectors.cosineSim(col("embedding"), col("qe")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= topK)
      .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rn")
  }

  /** D17: connected components over VERIFIED near-dup pairs (exact
    * shingle-Jaccard ≥ 0.8) by iterative min-label propagation: every
    * doc adopts the smallest doc_id reachable over edges; iterate
    * until fixpoint. Verified-pair graphs are tiny relative to the
    * corpus (edges = true dups), so the loop is a few small shuffles
    * regardless of corpus size — the standard transitive-closure step
    * real dedup pipelines run between verification and the keep-rule.
    */
  def dedupClusters(s: SparkSession, d: String): DataFrame = {
    val edges0 = DedupOps.ngramPairs(s, d, 0.8).select("doc_a", "doc_b")
    // Symmetric edge list including self-loops so isolated members keep labels.
    // localCheckpoint: materialize the (tiny) edge/label sets and cut
    // lineage — otherwise each iteration's plan nests the previous
    // one and planning dominates (measured 11 s → ~2 s at sf0.1).
    val edges = edges0
      .union(edges0.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    var labels = edges.select(col("doc_a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    // Convergence needs graph-diameter iterations; near-dup clusters
    // are shallow, 20 is headroom so the fixpoint (== the oracle's
    // transitive closure) is always reached on sane inputs.
    while (changed > 0 && iter < 20) {
      // Each node adopts min(own label, neighbors' labels).
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "doc_b"), "doc_b")
        .groupBy(col("doc_a").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .where(col("label") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels.groupBy("label")
      .agg(count(lit(1)).cast("long").as("cluster_size"),
        sort_array(collect_list("id")).as("members"))
      .where(col("cluster_size") >= 2)
      .select(col("label").as("cluster_rep"), col("cluster_size"),
        concat_ws(",", transform(col("members"), _.cast("string"))).as("members"))
      .orderBy("cluster_rep")
  }

  val qs: Seq[Q] = Seq(
    Q("q_knn_ivf", (s, d) => knnIvf(s, d), None),
    // Oracle: same verified-pair edges in SQL, transitive closure via
    // a recursive CTE, min reachable id = the propagated label.
    Q("q_dedup_clusters", (s, d) => dedupClusters(s, d),
      Some(DedupOps.ngramPairsSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          |       UNION SELECT doc_b, doc_a FROM pairs),
          |reach(a, b) AS (
          |  SELECT a, a FROM e
          |  UNION
          |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
          |lab AS (SELECT a AS id, min(b) AS label FROM reach GROUP BY 1)
          |SELECT label AS cluster_rep, count(*)::BIGINT AS cluster_size,
          |  array_to_string(list_sort(list(id)), ',') AS members
          |FROM lab GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin)),
  )
}
