package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Vectors
import graft.plans.TopK

/** D-block similarity search over the embedding corpus.
  *
  * Scale shape: the query set is small and BROADCAST; the corpus is
  * partition-parallel and never shuffled for the brute-force scan —
  * each corpus partition scores its rows against every query and
  * emits only per-partition top-k survivors before the final tiny
  * top-k reduce. The LSH variant buckets the corpus so each query
  * probes a few buckets instead of scanning everything.
  */
object SimilarityOps {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val K = 3

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  private def corpusDf(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").where(col("vec_id") >= 10)

  val qs: Seq[Q] = Seq(

    // D06: brute-force cosine top-k — the exact baseline. Native
    // codegen CosineSimilarity; broadcast queries ⇒ zero corpus
    // shuffle; top-k selection is the two-phase bounded-heap
    // TopK.perGroupRanked, so each corpus partition emits only its k
    // local winners per query (≤ k·partitions rows shuffled per query,
    // never the full scored corpus to one reducer — no Window node).
    Q("q_knn_brute",
      (s, d) => {
        val scored = corpusDf(s, d).crossJoin(broadcast(queriesDf(s, d)))
          .withColumn("sim", Vectors.cosineSim(col("embedding"), col("qe")))
          .select("qid", "vec_id", "sim")
        TopK.perGroupRanked(scored, Seq("qid"), "sim", "vec_id", K)
          .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 4).as("sim"))
          .orderBy("qid", "rn")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
              |c AS (SELECT * FROM embeddings WHERE vec_id >= 10),
              |p AS (SELECT qid, vec_id,
              |  list_inner_product(qe, embedding) /
              |  (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(embedding, embedding))) AS sim
              |  FROM q, c),
              |r AS (SELECT qid, vec_id, sim,
              |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM p)
              |SELECT qid, rn, vec_id AS neighbor_id, round(sim, 4) AS sim
              |FROM r WHERE rn <= $K ORDER BY qid, rn""".stripMargin)),

    // D37: FILTERED ANN — the vector-DB "metadata filter" staple
    // (neighbors among rows satisfying a predicate; here: sharing the
    // query's label). The filter composes BEFORE scoring — the
    // label-equality join replaces the cross join, so each corpus row
    // scores only against same-label queries and the top-k is EXACT
    // among eligible rows. The classic pitfall this avoids:
    // post-filtering an unfiltered top-k silently under-returns when
    // the predicate is selective (k survivors of a 1% filter need a
    // 100×k unfiltered list). At 100 TB the same composition holds
    // inside IVF cells: probe, then score only predicate-passing rows.
    Q("q_knn_filtered",
      (s, d) => {
        val q = t(s, d, "embeddings").where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("label").as("qlab"))
        val scored = corpusDf(s, d)
          .join(broadcast(q), col("label") === col("qlab"))
          .withColumn("sim", Vectors.cosineSim(col("embedding"), col("qe")))
          .select("qid", "vec_id", "sim")
        TopK.perGroupRanked(scored, Seq("qid"), "sim", "vec_id", K)
          .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 4).as("sim"))
          .orderBy("qid", "rn")
      },
      Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlab
              |          FROM embeddings WHERE vec_id < 10),
              |c AS (SELECT * FROM embeddings WHERE vec_id >= 10),
              |p AS (SELECT qid, vec_id,
              |  list_inner_product(qe, embedding) /
              |  (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(embedding, embedding))) AS sim
              |  FROM q JOIN c ON c.label = q.qlab),
              |r AS (SELECT qid, vec_id, sim,
              |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM p)
              |SELECT qid, rn, vec_id AS neighbor_id, round(sim, 4) AS sim
              |FROM r WHERE rn <= $K ORDER BY qid, rn""".stripMargin)),

    // D07: LSH-bucketed approximate top-k (the 100 TB path): 6-bit
    // hyperplane sketches × 6 tables bucket the corpus. MULTI-PROBE on
    // the query side: each query also probes every bucket at hamming
    // distance 1 from its own (bits+1 keys per table) — recall rises
    // steeply while the corpus index stays one row per (table, key).
    // Approximate by design → rows-only gate; the spec checks recall
    // against q_knn_brute.
    Q("q_knn_lsh",
      (s, d) => {
        val nT = 6; val bits = 6
        val c = corpusDf(s, d).select("vec_id", "embedding")
          .withColumn("sk", Vectors.hyperplaneSketches(col("embedding"), nT, bits, 64))
          .select(col("vec_id"), col("embedding").as("ce"), posexplode(col("sk")))
          .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "key"))
        val q = queriesDf(s, d)
          .withColumn("sk", Vectors.hyperplaneSketches(col("qe"), nT, bits, 64))
          .select(col("qid"), col("qe"), posexplode(col("sk")))
          .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "key0"))
          // probe own bucket (flip=-1 → xor 0) plus each 1-bit flip
          .select(col("qid"), col("qe"), col("tbl"), col("key0"),
            explode(sequence(lit(-1), lit(bits - 1))).as("flip"))
          .withColumn("key",
            when(col("flip") < 0, col("key0"))
              .otherwise(col("key0").bitwiseXOR(
                call_function("shiftleft", lit(1L), col("flip").cast("int")))))
        val cand = c.join(q.select("tbl", "key", "qid", "qe"), Seq("tbl", "key"))
          .select("qid", "qe", "vec_id", "ce").distinct()
        val scored = cand.withColumn("sim", Vectors.cosineSim(col("ce"), col("qe")))
          .select("qid", "vec_id", "sim")
        TopK.perGroupRanked(scored, Seq("qid"), "sim", "vec_id", K)
          .select(col("qid"), col("rn"), col("vec_id").as("neighbor_id"),
            round(col("sim"), 4).as("sim"))
          .orderBy("qid", "rn")
      },
      None),
  )
}
