package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** D-block corpus-curation operators: DSIR-style target-domain
  * importance selection and incremental (batch-vs-index) near-dedup.
  *
  * Scale contract shared by both: document TEXT never leaves the scan
  * projection — only fixed-width hashes and counts shuffle — and the
  * "model" side of every join is K-bounded (a 256-bucket n-gram model,
  * a persisted 8-byte-hash index) so it broadcasts or hash-joins
  * without ever being corpus-sized on the probe axis.
  */
object Curation {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Hashed-bigram bucket count for the DSIR model. Small on purpose:
    * the per-bucket model (tb, rb, weight) is THE broadcast side of
    * the scoring join, and 256 buckets of longs is bytes — at 100 TB
    * the model stays driver-trivial while per-doc scoring is a pure
    * map + one (doc_id, bucket)-keyed aggregate.
    */
  val dsirBuckets = 256L

  /** Engine-portable 31-bit token fingerprint (the q_dedup_spans
    * device): length*131 + Σ charcode_i·31^(i-1) over the first 8
    * chars, mod 2^31 — exact BIGINT arithmetic both engines run
    * verbatim, so bucket membership can never drift between Spark and
    * the oracle.
    */
  private def tokHash(x: Column): Column = {
    val p31 = SpanConstants.pow31
    val poly = (1 to 8).foldLeft(length(x).cast("long") * 131L: Column) { (acc, i) =>
      acc + when(length(x) >= i, ascii(substring(x, i, 1)).cast("long")).otherwise(0L) * p31(i - 1)
    }
    poly % 2147483648L
  }

  /** The generated-SQL mirror of [[tokHash]] over a `tok` column. */
  private val tokHashSql: String = {
    val p31 = SpanConstants.pow31
    val terms = (1 to 8).map { i =>
      s"(CASE WHEN length(tok) >= $i THEN ascii(substr(tok, $i, 1)) ELSE 0 END)::BIGINT * ${p31(i - 1)}::BIGINT"
    }.mkString(" + ")
    s"(length(tok) * 131 + $terms) % 2147483648"
  }

  /** D38: DSIR-style importance selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much its hashed-bigram profile looks like
    * a TARGET domain (here lang='en') versus the raw corpus, keep the
    * positive-margin docs. DSIR's log-likelihood ratio is replaced by
    * the EXACT-INTEGER margin Σ_b c_b·(t_b·R − r_b·T) — the same
    * sign/ordering signal (c=doc bucket counts, t/r=target/raw bucket
    * totals, T/R grand totals; dividing by T·R gives the relative-
    * frequency margin Σ c_b·(t_b/T − r_b/R)) — because exact BIGINT
    * arithmetic cannot flip a keep/drop boundary between engines the
    * way summed floating logs can. At petabyte token counts the
    * production form normalizes to doubles first; the plan shape is
    * identical.
    *
    * Plan shape: tokens hash at the scan (one transform), bigram
    * buckets explode as (doc_id, tgt, b) longs only, the model is a
    * 256-row broadcast, and scoring is one (doc_id,b) aggregate + one
    * broadcast join + one doc_id aggregate — no window, no self-join,
    * no text in any exchange.
    */
  def dsirSelect(s: SparkSession, d: String): DataFrame = {
    val B = dsirBuckets
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        filter(split(lower(col("text")), " "), x => x =!= "").as("ws"))
    // th materialized as an attribute: lambdas below reference it
    // twice per bigram (the D-block plan rule — an expression child
    // re-executes per lambda element).
    val th = docs
      .select(col("doc_id"), col("lang"), transform(col("ws"), tokHash(_)).as("th"))
    val eb = th
      .select(col("doc_id"),
        (col("lang") === "en").cast("long").as("tgt"),
        explode(when(size(col("th")) >= 2,
          transform(sequence(lit(0), size(col("th")) - 2),
            i => (element_at(col("th"), i + 1) * 31L + element_at(col("th"), i + 2)) % B))
          .otherwise(array().cast("array<bigint>"))).as("b"))
    // cdb feeds BOTH the model (bucket totals) and the scoring join —
    // materialize it once (the D17 localCheckpoint device) or the
    // scan→tokenize→hash→explode→aggregate tree executes three times
    // (measured 5.5 s → 1.9 s at sf0.01). A production pipeline
    // checkpoints this hand-off for the same reason.
    val cdb = eb.groupBy("doc_id", "b")
      .agg(count(lit(1)).as("c"), max("tgt").as("tgt"))
      .localCheckpoint(true)
    val buckets = cdb.groupBy("b")
      .agg(sum("c").as("rb"), sum(col("c") * col("tgt")).as("tb"))
    val totals = buckets.agg(sum("rb").as("r"), sum("tb").as("t"))
    val model = buckets.crossJoin(broadcast(totals))
      .select(col("b"), (col("tb") * col("r") - col("rb") * col("t")).as("w"))
    val scores = cdb.join(broadcast(model), "b")
      .groupBy("doc_id").agg(sum(col("c") * col("w")).as("s"))
    t(s, d, "documents").select("doc_id")
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("s"), lit(0L)).as("dsir_score"),
        when(coalesce(col("s"), lit(0L)) > 0, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  private val dsirOracle: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, lang, unnest(ws) AS tok,
       |    generate_subscripts(ws, 1) AS pos
       |  FROM w),
       |th AS (
       |  SELECT doc_id, lang, pos, $tokHashSql AS th FROM toks),
       |bg AS (
       |  SELECT doc_id, lang,
       |    (th * 31 + lead(th) OVER (PARTITION BY doc_id ORDER BY pos)) % $dsirBuckets AS b
       |  FROM th),
       |eb AS (
       |  SELECT doc_id, (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS tgt, b
       |  FROM bg WHERE b IS NOT NULL),
       |cdb AS (
       |  SELECT doc_id, b, count(*)::BIGINT AS c, max(tgt) AS tgt
       |  FROM eb GROUP BY 1, 2),
       |bk AS (
       |  SELECT b, sum(c)::BIGINT AS rb, sum(c * tgt)::BIGINT AS tb
       |  FROM cdb GROUP BY 1),
       |tot AS (SELECT sum(rb)::BIGINT AS r, sum(tb)::BIGINT AS t FROM bk),
       |model AS (SELECT b, (tb * r - rb * t)::BIGINT AS w FROM bk, tot),
       |sc AS (
       |  SELECT doc_id, sum(c * w)::BIGINT AS s
       |  FROM cdb JOIN model USING (b) GROUP BY 1)
       |SELECT d.doc_id, coalesce(s, 0)::BIGINT AS dsir_score,
       |  (CASE WHEN coalesce(s, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ---- D39: incremental dedup against a persisted index ------------

  private[graft] def indexPath = s"${Lakehouse.scratch}/dedup_incr_index"

  /** Stage D39's persisted corpus-side index: the exact-Jaccard
    * shingle inverted index (doc_id, 8-byte hash) plus per-doc shingle
    * counts, materialized as LakeTables. This is the rare batch job; a
    * production pipeline maintains it across ingests and NEVER re-reads
    * corpus text on the dedup path.
    */
  def stageIncrementalIndex(s: SparkSession, d: String): Unit = {
    val corpus = t(s, d, "documents").where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val sh = corpus.select(col("doc_id"),
      explode(DedupOps.shingleHashes(col("ws"))).as("h"))
    graft.sources.LakeTable.create(s, s"$indexPath/shingles", sh)
    graft.sources.LakeTable.create(s, s"$indexPath/sizes",
      sh.groupBy("doc_id").agg(count(lit(1)).as("sz")))
    // the index's df table, maintained WITH the index (what the
    // guardrail pre-flight probes — rebuilding it per batch would
    // rescan the whole index for a quantity the ingest job already
    // knows)
    graft.sources.LakeTable.create(s, s"$indexPath/dfs",
      sh.groupBy("h").agg(count(lit(1)).as("dfi")))
  }

  /** D39 verb: dedup an incoming BATCH against the persisted index —
    * the shape every continuously-ingesting training pipeline needs
    * (a new crawl snapshot arrives; find which new docs duplicate the
    * existing corpus WITHOUT re-scanning the corpus). Cost is linear
    * in the batch: batch shingles compute fresh (one pass over batch
    * text), the join probes the stored 8-byte-hash index, and exact
    * Jaccard ≥ 0.8 verifies — identical arithmetic to q_dedup_ngram,
    * restricted to batch×corpus pairs. Only (id, 8B hash) rows ever
    * shuffle; corpus text is never read.
    */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    // the per-doc shingle count rides along each exploded row (it is
    // constant per batch doc), so the batch text is scanned exactly
    // ONCE — no second aggregate-and-join pass over the batch
    val batch = t(s, d, "documents").where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), DedupOps.shingleHashes(col("ws")).as("sh"))
    val bsh = batch.select(col("doc_id").as("batch_id"),
      size(col("sh")).cast("long").as("sz_b"), explode(col("sh")).as("h"))
    val idx = graft.sources.LakeTable.read(s, s"$indexPath/shingles")
      .select(col("doc_id").as("corpus_id"), col("h"))
    val isz = graft.sources.LakeTable.read(s, s"$indexPath/sizes")
      .select(col("doc_id").as("corpus_id"), col("sz").as("sz_c"))
    def probe(b: DataFrame, i: DataFrame, sz: DataFrame): DataFrame =
      b.join(i, "h")
        .groupBy("batch_id", "corpus_id")
        .agg(count(lit(1)).as("inter"), max("sz_b").as("sz_b"))
        .join(sz, "corpus_id")
        .withColumn("jaccard", round(
          col("inter").cast("double") / (col("sz_b") + col("sz_c") - col("inter")) + lit(1e-9), 4))
        .where(col("jaccard") >= 0.8)
        .select("batch_id", "corpus_id", "jaccard")
        .orderBy("batch_id", "corpus_id")
    if (DedupGuard.mode(s) == "off") return probe(bsh, idx, isz)
    // Pre-flight (DedupGuard): the probe join's candidate stream is
    // EXACTLY Σ_h df_batch(h)·df_index(h) over co-occurring shingles —
    // one aggregate over the batch df (computed fresh, ∝ batch) joined
    // to the index's own STORED df table (maintained at stage time;
    // recomputed only if an older index lacks it).
    // The batch shingle stream is MATERIALIZED once (localCheckpoint —
    // the dsirSelect cdb hand-off device): the pre-flight aggregate and
    // the probe otherwise each re-tokenize and re-hash the batch text
    // (measured: the pre-flight doubled the batch scan cost at sf0.1).
    // Bounded by the ingest batch, not the corpus.
    val bshM = bsh.localCheckpoint(true)
    val bdf = bshM.groupBy("h").agg(count(lit(1)).as("dfb"))
    val idf =
      if (graft.sources.LakeTable.currentVersion(s, s"$indexPath/dfs").isDefined)
        graft.sources.LakeTable.read(s, s"$indexPath/dfs")
      else idx.groupBy("h").agg(count(lit(1)).as("dfi"))
    val co = bdf.join(idf, "h")
    // DECIMAL + clamp: same overflow soundness as DedupGuard.pairEstimate
    val r = co.agg(
      sum(col("dfb").cast("decimal(38,0)") * col("dfi").cast("decimal(38,0)")),
      sum(col("dfb") + col("dfi")).cast("long")).head()
    val est = if (r.isNullAt(0)) 0L
      else r.getDecimal(0).min(java.math.BigDecimal.valueOf(Long.MaxValue)).longValue()
    val rows = if (r.isNullAt(1)) 0L else r.getLong(1)
    if (DedupGuard.admitUncapped(s, "incrementalDedup", est, rows, None).uncapped)
      probe(bshM, idx, isz)
    else {
      // routed: drop hot co-occurring shingles from BOTH streams and
      // recompute both size tables over the informative universe (the
      // carried sz_b / stored sz_c count full shingle sets — keeping
      // them would silently deflate jaccard under the cap)
      val hot = co.where(col("dfb") + col("dfi") > DedupGuard.dfCap(s)).select("h")
      val bshC = bshM.join(hot, Seq("h"), "left_anti")
      val idxC = idx.join(hot, Seq("h"), "left_anti")
      val bC = bshC.drop("sz_b")
        .join(bshC.groupBy("batch_id").agg(count(lit(1)).as("sz_b")), "batch_id")
      val iszC = idxC.groupBy("corpus_id").agg(count(lit(1)).as("sz_c"))
      probe(bC, idxC, iszC)
    }
  }

  private[graft] val incrementalOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
      |  FROM w, UNNEST(range(1, len(ws)-1)) t(i) WHERE len(ws) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(ws, ' ') FROM w WHERE len(ws) < 3),
      |b AS (SELECT doc_id AS batch_id, g FROM sh WHERE doc_id % 10 = 0),
      |c AS (SELECT doc_id AS corpus_id, g FROM sh WHERE doc_id % 10 <> 0),
      |bsz AS (SELECT batch_id, count(*) AS sz_b FROM b GROUP BY 1),
      |csz AS (SELECT corpus_id, count(*) AS sz_c FROM c GROUP BY 1),
      |it AS (SELECT batch_id, corpus_id, count(*) AS inter
      |       FROM b JOIN c USING (g) GROUP BY 1, 2)
      |SELECT batch_id, corpus_id,
      |  round(inter::DOUBLE / (sz_b + sz_c - inter) + 0.000000001, 4) AS jaccard
      |FROM it JOIN bsz USING (batch_id) JOIN csz USING (corpus_id)
      |WHERE round(inter::DOUBLE / (sz_b + sz_c - inter) + 0.000000001, 4) >= 0.8
      |ORDER BY batch_id, corpus_id""".stripMargin

  // ---- D40: BPE tokenizer (train driver-side, encode native) -------

  private def bpePath = s"${Lakehouse.scratch}/bpe_vocab"

  /** The persisted D40 merge table, rank-ordered (KBs — safe to
    * collect; it rides into codegen as a reference constant). Shared
    * with the round-trip/conservation property oracles.
    */
  def bpeMerges(s: SparkSession): Seq[(String, String)] = {
    import s.implicits._
    graft.sources.LakeTable.read(s, bpePath)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
  }

  /** Column wrapper for the native BPE-encode expression. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftglue.Glue.column(
      graft.plans.BpeEncode(
        org.apache.spark.sql.graftglue.Glue.expression(text), merges))

  /** D40 setup: TRAIN the BPE merge table on a bounded deterministic
    * sample (smallest 256 doc_ids — a tokenizer needs thousands of
    * word tokens, not the corpus; the real GPT-2 vocabulary was
    * trained once on a sample and shipped as an artifact) and persist
    * it as a versioned LakeTable — the same index-as-a-table lifecycle
    * as the PQ index (D24): retrain = new version, encoders pin a
    * snapshot.
    */
  def stageBpeVocab(s: SparkSession, d: String, numMerges: Int = 200): Unit = {
    import s.implicits._
    val sample = t(s, d, "documents").select("doc_id", "text")
      .orderBy("doc_id").limit(256)
      .select("text").as[String].collect()
    val wordFreq = scala.collection.mutable.Map.empty[String, Long]
    sample.foreach(_.split(" ").iterator.filter(_.nonEmpty)
      .foreach(w => wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L))
    val merges = graft.plans.BpeCodec.train(wordFreq.toMap, numMerges)
    val rows = merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
    graft.sources.LakeTable.create(s, bpePath,
      s.createDataFrame(rows).toDF("rank", "left", "right"))
  }

  /** D40 verb: distributed BPE encode of the corpus with the STORED
    * merge table (collected — a merge table is KBs; broadcast into
    * codegen as a reference constant). One native-expression pass;
    * output is per-doc token/piece accounting, the numbers a training
    * pipeline actually budgets with (pieces-per-doc drives packing,
    * pieces/words measures tokenizer fit on the domain).
    */
  def bpeEncodeCorpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = graft.sources.LakeTable.read(s, bpePath)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    // fan: the native BPE-encode pass is the heavy map here
    val docs = Tables.fan(t(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long").as("n_words"),
        bpeEncode(col("text"), merges).as("pieces"))
    docs.select(col("doc_id"), col("n_words"),
        size(col("pieces")).cast("long").as("n_pieces"))
      .orderBy("doc_id")
  }

  /** D42: TOKENIZER-AWARE sequence packing — q_seq_pack's budget is
    * whitespace words, but trainers budget in TOKENIZER PIECES; the
    * two disagree exactly where it hurts (long words explode into
    * many subwords). This is the composed production form: per-doc
    * piece counts come from ONE native BPE-encode pass with the
    * persisted D40 merge table, then docs pack into fixed 256-piece
    * sequences by exclusive running piece count within independent
    * (lang, doc_id % packShards) streams — shard count follows
    * cluster parallelism, never a global-order window. Deterministic
    * for a given vocabulary version + shard count.
    */
  def packBpe(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val seqLen = 256
    val merges = graft.sources.LakeTable.read(s, bpePath)
      .orderBy("rank").select("left", "right")
      .as[(String, String)].collect().toSeq
    val shards = TextOps.packShards
    val docs = Tables.fan(t(s, d, "documents").select("doc_id", "lang", "text"))
      .select(col("doc_id"), col("lang"),
        size(bpeEncode(col("text"), merges)).cast("long").as("pieces"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("prior", coalesce(sum("pieces").over(w), lit(0L)))
      .withColumn("seq_id", floor(col("prior") / seqLen))
      .groupBy("lang", "shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("pieces").as("n_pieces"))
      .orderBy("lang", "shard", "seq_id")
  }

  val qs: Seq[Q] = Seq(
    Q("q_dsir_select", (s, d) => dsirSelect(s, d), Some(dsirOracle)),
    Q.staged("q_dedup_incremental",
      setup = (s, d) => stageIncrementalIndex(s, d),
      verb = (s, d) => incrementalDedup(s, d),
      oracle = Some(incrementalOracle)),
    Q.staged("q_bpe_tokens",
      setup = (s, d) => stageBpeVocab(s, d),
      verb = (s, d) => bpeEncodeCorpus(s, d)),
    Q.staged("q_pack_bpe",
      setup = (s, d) => stageBpeVocab(s, d),
      verb = (s, d) => packBpe(s, d)),
  )
}
