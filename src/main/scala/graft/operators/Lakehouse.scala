package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.sources.{LakeCatalog, LakeTable}

/** B-block: the lakehouse table layer exercised end-to-end. Each query
  * WRITES through LakeTable into a scratch dir and reads back, so the
  * correctness gate covers the round trip (write path + commit log +
  * snapshot resolution + read path), not just a transformation.
  */
object Lakehouse {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Scratch root for lake writes (driver contract: stay inside the
    * repo; target/ is build scratch).
    */
  def scratch: String = sys.env.getOrElse("GRAFT_LAKE_DIR", "/root/repo/target/lake")

  val qs: Seq[Q] = Seq(

    // B01: Hive-partitioned write + partition-pruned read-back. The
    // filter on the partition column prunes at planning time — the
    // scan touches only the 1-URGENT directory (spec asserts the
    // PartitionFilters entry).
    Q("q_write_partitioned",
      (s, d) => {
        val lake = s"$scratch/orders_part"
        LakeTable.create(s, lake,
          t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
          partitionBy = Seq("o_orderpriority"))
        LakeTable.read(s, lake)
          .where(col("o_orderpriority") === "1-URGENT")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
      },
      Some("""SELECT count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin)),

    // B02: small-file compaction — 64-file group bin-packed to 4,
    // same data (the gate proves it), new snapshot, old one retained.
    Q.staged("q_compaction",
      setup = (s, d) => LakeTable.create(s, s"$scratch/lineitem_compact",
        t(s, d, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
          .repartition(64)),
      verb = (s, _) => {
        val lake = s"$scratch/lineitem_compact"
        LakeTable.compact(s, lake, 4)
        LakeTable.read(s, lake)
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"),
            round(sum("l_extendedprice"), 2).as("price"))
      },
      oracle = Some("""SELECT count(*) AS cnt, round(sum(l_quantity),2) AS qty,
             |round(sum(l_extendedprice),2) AS price FROM lineitem""".stripMargin)),

    // B03: MERGE INTO (copy-on-write upsert): every 7th customer gets
    // +1000 balance (update), every 11th is cloned to a new key
    // (insert); read-back aggregates must match the SQL-spelled merge.
    Q("q_merge_upsert",
      (s, d) => {
        val lake = s"$scratch/customer_merge"
        val base = t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
        LakeTable.create(s, lake, base)
        val updates = base.where(col("c_custkey") % 7 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 1000)
        val inserts = base.where(col("c_custkey") % 11 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000)
        LakeTable.merge(s, lake, updates.union(inserts), "c_custkey")
        LakeTable.read(s, lake)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH src AS (
             |  SELECT c_custkey, c_nationkey, c_acctbal + 1000 AS c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_nationkey, c_acctbal
             |  FROM customer WHERE c_custkey % 11 = 0),
             |merged AS (
             |  SELECT * FROM src
             |  UNION ALL
             |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
             |  WHERE c_custkey NOT IN (SELECT c_custkey FROM src))
             |SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B04: time travel — v0 holds pre-1997 orders, v1 merges in the
    // rest; reading version 0 must still see only the old snapshot.
    Q("q_time_travel",
      (s, d) => {
        val lake = s"$scratch/orders_tt"
        val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice", "o_orderdate")
        LakeTable.create(s, lake, ord.where(col("o_orderdate") < "1997-01-01"))
        LakeTable.merge(s, lake, ord.where(col("o_orderdate") >= "1997-01-01"), "o_orderkey")
        LakeTable.read(s, lake, version = Some(0L))
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
      },
      Some("""SELECT count(*) AS cnt, round(sum(o_totalprice),2) AS rev FROM orders
             |WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin)),

    // B05: bucketed tables — both sides bucketed 8 ways on the join
    // key, so the sort-merge join needs NO shuffle (spec asserts no
    // Exchange). At 100 TB this is the pre-partitioned fact-fact join.
    // Staged: the two bucketed table WRITES are input construction,
    // the benched verb is the zero-exchange join itself.
    Q.staged("q_bucketed_join",
      (s, d) => {
        val dir = s"$scratch/bucketed"
        s.sql("DROP TABLE IF EXISTS g_orders_buck")
        s.sql("DROP TABLE IF EXISTS g_lineitem_buck")
        t(s, d, "orders").select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$dir/orders").saveAsTable("g_orders_buck")
        t(s, d, "lineitem").select("l_orderkey", "l_quantity")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$dir/lineitem").saveAsTable("g_lineitem_buck")
      },
      (s, _) =>
        s.table("g_lineitem_buck").hint("merge")
          .join(s.table("g_orders_buck").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS cnt, round(sum(l_quantity),2) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B06: schema evolution — v1 file group adds a `lang` column; the
    // merged-schema read nulls it for v0 rows.
    Q("q_schema_evolution",
      (s, d) => {
        val lake = s"$scratch/docs_evo"
        val docs = t(s, d, "documents")
        LakeTable.create(s, lake,
          docs.where(col("doc_id") % 2 === 0).select("doc_id", "n_chars"))
        LakeTable.append(s, lake,
          docs.where(col("doc_id") % 2 === 1).select("doc_id", "n_chars", "lang"))
        LakeTable.read(s, lake)
          .groupBy(coalesce(col("lang"), lit("legacy")).as("lang"))
          .agg(count(lit(1)).as("cnt"), sum("n_chars").as("chars"))
          .orderBy("lang")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, n_chars, NULL AS lang FROM documents WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT doc_id, n_chars, lang FROM documents WHERE doc_id % 2 = 1)
             |SELECT coalesce(lang, 'legacy') AS lang, count(*) AS cnt, sum(n_chars)::BIGINT AS chars
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B12: the registered data source — write via
    // .format("graft").save, read back via .format("graft").load with
    // a filter (pushed through the relation into the parquet scan).
    Q("q_lake_format",
      (s, d) => {
        val lake = s"$scratch/orders_fmt"
        t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.format("graft").mode("overwrite").save(lake)
        s.read.format("graft").load(lake)
          .where(col("o_orderstatus") === "F" && col("o_totalprice") > 100000)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000
             |GROUP BY 1""".stripMargin)),

    // B13: Z-order clustering — rewrite lineitem clustered on
    // (l_orderkey, l_partkey); a two-column range predicate then
    // touches a fraction of the files (spec asserts the skip), and
    // results stay exact (this oracle).
    Q.staged("q_zorder",
      setup = (s, d) => LakeTable.create(s, s"$scratch/lineitem_zorder",
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
          .repartition(8)),
      verb = (s, _) => {
        val lake = s"$scratch/lineitem_zorder"
        LakeTable.clusterBy(s, lake, Seq("l_orderkey", "l_partkey"), 8)
        LakeTable.read(s, lake)
          .where(col("l_orderkey") < 1000 && col("l_partkey") < 500)
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
      },
      oracle = Some("""SELECT count(*) AS cnt, round(sum(l_quantity),2) AS qty FROM lineitem
             |WHERE l_orderkey < 1000 AND l_partkey < 500""".stripMargin)),

    // B64: INCREMENTAL clustering — the steady-state OPTIMIZE at scale:
    // only file groups committed since the last cluster rewrite are
    // Z-ordered; the previously clustered group rides the commit
    // forward untouched (cost ∝ new data, not table size — a full
    // re-cluster of 100 TB is a 100 TB write and can never keep up
    // with ingest). Staged: bench times the incremental rewrite of the
    // appended half, not the initial build. Results stay exact over
    // the full table (this oracle); the spec pins that the first
    // cluster's output dir is carried forward byte-identical.
    Q.staged("q_cluster_incremental",
      setup = (s, d) => {
        val lake = s"$scratch/lineitem_zinc"
        val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
        LakeTable.create(s, lake,
          li.where(col("l_orderkey") % 2 === 0).repartition(4))
        LakeTable.clusterBy(s, lake, Seq("l_orderkey", "l_partkey"), 4)
        LakeTable.append(s, lake,
          li.where(col("l_orderkey") % 2 === 1).repartition(4))
      },
      verb = (s, _) => {
        val lake = s"$scratch/lineitem_zinc"
        LakeTable.clusterByIncremental(s, lake, Seq("l_orderkey", "l_partkey"), 4)
        LakeTable.read(s, lake)
          .where(col("l_orderkey") < 1000 && col("l_partkey") < 500)
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
      },
      oracle = Some("""SELECT count(*) AS cnt, round(sum(l_quantity),2) AS qty FROM lineitem
             |WHERE l_orderkey < 1000 AND l_partkey < 500""".stripMargin)),

    // B65: ANALYZE TABLE — one aggregate pass records per-column NDV
    // (+ string length stats) in the table meta; the HMS facade serves
    // them to external cost-based optimizers. Gate: HLL is EXACT below
    // its sparse threshold, so low-cardinality NDVs hash-match DuckDB's
    // exact COUNT(DISTINCT) — a true cross-engine equality, not a
    // bound. Staged: bench times the analyze pass alone.
    Q.staged("q_analyze",
      setup = (s, d) => LakeTable.create(s, s"$scratch/orders_analyze",
        t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_orderstatus")),
      verb = (s, _) => {
        val lake = s"$scratch/orders_analyze"
        LakeTable.analyze(s, lake,
          Seq("o_orderkey", "o_orderpriority", "o_orderstatus"))
        import s.implicits._
        val ndv = LakeTable.tableNdv(s, lake)
        Seq(("o_orderpriority", ndv("o_orderpriority").ndv),
            ("o_orderstatus", ndv("o_orderstatus").ndv))
          .toDF("col_name", "ndv").orderBy("col_name")
      },
      oracle = Some("""SELECT * FROM (
             |  SELECT 'o_orderpriority' AS col_name,
             |         count(DISTINCT o_orderpriority)::BIGINT AS ndv FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus', count(DISTINCT o_orderstatus)::BIGINT FROM orders
             |) ORDER BY col_name""".stripMargin)),

    // B14: incremental MV refresh — the algebraic (sum/count) rollup
    // absorbs a delta WITHOUT rescanning old facts: combine stored
    // partials with the delta's partials and merge by key.
    Q("q_mv_incremental",
      (s, d) => {
        val lake = s"$scratch/mv_incr"
        val ord = t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
        def agg(df: DataFrame) = df.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("rev"))
        LakeTable.create(s, lake, agg(ord.where(col("o_orderdate") < "1997-01-01")))
        // Delta arrives: aggregate ONLY the delta, combine partials.
        val delta = agg(ord.where(col("o_orderdate") >= "1997-01-01"))
        val combined = LakeTable.read(s, lake).unionByName(delta)
          .groupBy("o_orderpriority")
          .agg(sum("cnt").as("cnt"), sum("rev").as("rev"))
        LakeTable.merge(s, lake, combined, "o_orderpriority")
        LakeTable.read(s, lake)
          .select(col("o_orderpriority"), col("cnt"), round(col("rev"), 2).as("rev"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B15: row-level DML — DELETE WHERE then UPDATE ... SET on a
    // LakeTable, read back; the oracle spells the same mutations.
    Q("q_lake_dml",
      (s, d) => {
        val lake = s"$scratch/customer_dml"
        LakeTable.create(s, lake,
          t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal"))
        LakeTable.delete(s, lake, col("c_acctbal") < 0)
        LakeTable.update(s, lake, col("c_nationkey") < 5,
          Map("c_acctbal" -> (col("c_acctbal") * 1.1)))
        LakeTable.read(s, lake)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal") + 1e-6, 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH kept AS (SELECT c_custkey, c_nationkey,
             |  CASE WHEN c_nationkey < 5 THEN c_acctbal * 1.1 ELSE c_acctbal END AS c_acctbal
             |  FROM customer WHERE NOT (c_acctbal < 0))
             |SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal) + 0.000001, 2) AS bal
             |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B58-B61: column-mapping DDL in the serving path. Three physical
    // generations — (1) original names with an INT size column,
    // (2) written after RENAME p_retailprice->price, (3) after DROP
    // p_brand and WIDEN p_size->BIGINT — assemble into ONE logical
    // schema at read time; no generation was rewritten (the DDL is
    // metadata-only). Staged: bench times the mapped READ, not the
    // staging writes. The oracle states the same aggregate over the
    // union of the three disjoint slices = the whole source table.
    Q.staged("q_lake_rename",
      setup = (s, d) => {
        val lake = s"$scratch/part_mapped"
        val src = t(s, d, "part")
        def slice(r: Int) = src.where(pmod(col("p_partkey"), lit(3)) === r)
        LakeTable.create(s, lake, slice(0)
          .select(col("p_partkey"), col("p_retailprice"),
            col("p_size").cast("int").as("p_size"), col("p_brand")))
        LakeTable.renameColumn(s, lake, "p_retailprice", "price")
        LakeTable.append(s, lake, slice(1)
          .select(col("p_partkey"), col("p_retailprice").as("price"),
            col("p_size").cast("int").as("p_size"), col("p_brand")))
        LakeTable.dropColumn(s, lake, "p_brand")
        LakeTable.widenColumn(s, lake, "p_size",
          org.apache.spark.sql.types.LongType)
        LakeTable.append(s, lake, slice(2)
          .select(col("p_partkey"), col("p_retailprice").as("price"),
            col("p_size").cast("long").as("p_size")))
      },
      verb = (s, d) => {
        val lake = s"$scratch/part_mapped"
        LakeTable.read(s, lake)
          .where(col("price") > 950)
          .groupBy("p_size")
          .agg(count(lit(1)).as("cnt"), round(sum("price") + 1e-6, 2).as("rev"))
          .orderBy("p_size")
      },
      oracle = Some("""SELECT CAST(p_size AS BIGINT) AS p_size, count(*) AS cnt,
             |round(sum(p_retailprice) + 0.000001, 2) AS rev
             |FROM part WHERE p_retailprice > 950 GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B46: merge-on-read DELETE via deletion vectors — two MOR
    // deletes mark rows in per-file roaring bitmaps (cumulative, no
    // data file rewritten; the commit re-references every dir), the
    // read applies the vectors at scan time, then compact PURGES them
    // and the final aggregate comes off the rewritten fast path. The
    // oracle applies both predicates relationally.
    Q("q_lake_mor",
      (s, d) => {
        val lake = s"$scratch/customer_mor"
        LakeTable.create(s, lake,
          t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal"))
        LakeTable.deleteMor(s, lake, col("c_acctbal") < 0)
        LakeTable.updateMor(s, lake, col("c_nationkey") < 5,
          Map("c_acctbal" -> (col("c_acctbal") * 1.1)))
        LakeTable.deleteMor(s, lake, col("c_nationkey") === 3)
        LakeTable.compact(s, lake, 2)
        LakeTable.read(s, lake)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal") + 1e-6, 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH kept AS (SELECT c_custkey, c_nationkey,
             |  CASE WHEN c_nationkey < 5 THEN c_acctbal * 1.1 ELSE c_acctbal END AS c_acctbal
             |  FROM customer WHERE NOT (c_acctbal < 0))
             |SELECT c_nationkey, count(*) AS cnt,
             |round(sum(c_acctbal) + 0.000001, 2) AS bal
             |FROM kept WHERE NOT (c_nationkey = 3)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B51: DV-mode point serving — the B46 complement: while deletion
    // vectors are LIVE (no compaction), a catalog-SQL key-range query
    // must still serve off the fast path: filters pushed, columns
    // pruned, min/max sidecars skipping to ~1 of 16 range-disjoint
    // files (GraftDvScanBuilder), vectors applied on the survivors.
    // Before round 6 this path full-scanned every column of every
    // file through a row boundary — the long-lived-MOR scale killer.
    Q.staged("q_mor_point",
      setup = (s, d) => {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.orders_morpt")
        val lake = s"${graft.GraftSession.catalogRoot}/db/orders_morpt"
        val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        LakeTable.create(s, lake, orders.repartitionByRange(16, col("o_orderkey")))
        LakeTable.setSortBy(s, lake, Seq("o_orderkey"))
        LakeTable.compact(s, lake, 16)
        LakeTable.deleteMor(s, lake, pmod(col("o_orderkey"), lit(1000)) === 7)
      },
      verb = (s, _) =>
        s.sql("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
                |FROM graft_cat.db.orders_morpt
                |WHERE o_orderkey BETWEEN 5000 AND 5200
                |ORDER BY o_orderkey""".stripMargin),
      oracle = Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
             |FROM orders
             |WHERE o_orderkey BETWEEN 5000 AND 5200 AND o_orderkey % 1000 <> 7
             |ORDER BY 1""".stripMargin)),

    // B43: write.sort.by serving — record a sort order, append the
    // fact through the NATIVE ordered write (range-disjoint files),
    // SORT-compact the pre-order seed in, then answer a key range off
    // the footer-stats pruner. Oracle = the same range query inline.
    Q("q_sorted_serve",
      (s, d) => {
        val lake = s"$scratch/orders_sorted"
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        LakeTable.create(s, lake, orders.limit(0)) // empty seed fixes schema
        LakeTable.setSortBy(s, lake, Seq("o_orderkey"))
        orders.write.format("graft").mode("append").save(lake)
        LakeTable.compact(s, lake, 8) // sort compaction: range-disjoint files
        LakeTable.readRange(s, lake, "o_orderkey", 1000L, 2000L)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice") + 1e-6, 2).as("tot"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS cnt,
             |round(sum(o_totalprice) + 0.000001, 2) AS tot
             |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B48: RESTORE — two mutations (one COW delete, one MOR delete)
    // then a rollback to v0: the aggregate must equal the PRISTINE
    // input exactly, proving both mutation styles fully unwind
    // (deletion-vector state pinned by the restore commit). O(1) in
    // data size: the restore re-references v0's dirs.
    Q("q_lake_restore",
      (s, d) => {
        val lake = s"$scratch/customer_restore"
        LakeTable.create(s, lake,
          t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal"))
        LakeTable.delete(s, lake, col("c_acctbal") < 0)
        LakeTable.deleteMor(s, lake, col("c_nationkey") === 3)
        LakeTable.restore(s, lake, 0L)
        LakeTable.read(s, lake)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal") + 1e-6, 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS cnt,
             |round(sum(c_acctbal) + 0.000001, 2) AS bal
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B47: persistent catalog views — the stored query re-executes on
    // read (virtual-table serving), composing with outer SQL; the
    // oracle inlines the same two-level query.
    Q.staged("q_catalog_view",
      setup = (s, d) => {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.vq")
        s.sql("DROP TABLE IF EXISTS graft_cat.vq.nation_base")
        t(s, d, "nation").writeTo("graft_cat.vq.nation_base").create()
        s.sql("""CALL graft_cat.system.create_view('vq.by_region',
          'SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
           FROM graft_cat.vq.nation_base GROUP BY n_regionkey', true)""")
      },
      verb = (s, _) =>
        s.sql("""SELECT * FROM graft_cat.vq.by_region
                 WHERE n >= 3 ORDER BY n_regionkey"""),
      oracle = Some("""SELECT * FROM (
             |  SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
             |  FROM nation GROUP BY n_regionkey) t
             |WHERE n >= 3 ORDER BY n_regionkey""".stripMargin)),

    // B28: predicate-scoped overwrite (Delta replaceWhere / INSERT
    // OVERWRITE): one atomic commit deletes the low-nation region and
    // installs its recomputed replacement (balances re-signed) —
    // never the delete-then-append gap. File-group granular like the
    // other DML verbs; the oracle spells the same region swap.
    Q("q_lake_replace",
      (s, d) => {
        val lake = s"$scratch/customer_replace"
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
        LakeTable.create(s, lake, cust)
        val replacement = cust.where(col("c_nationkey") < 5)
          .withColumn("c_acctbal", abs(col("c_acctbal")))
        LakeTable.overwriteWhere(s, lake, col("c_nationkey") < 5, replacement)
        LakeTable.read(s, lake)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal") + 1e-6, 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""WITH st AS (
             |  SELECT c_custkey, c_nationkey, abs(c_acctbal) AS c_acctbal
             |  FROM customer WHERE c_nationkey < 5
             |  UNION ALL
             |  SELECT c_custkey, c_nationkey, c_acctbal
             |  FROM customer WHERE NOT (c_nationkey < 5))
             |SELECT c_nationkey, count(*) AS cnt,
             |round(sum(c_acctbal) + 0.000001, 2) AS bal
             |FROM st GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B38: DYNAMIC partition overwrite through the native DSv2
    // BatchWrite (GraftWrite.scala; the V1 fallback had to reject
    // this): the overwrite replaces exactly the partitions present in
    // the incoming data — untouched partitions carry forward without
    // a rewrite — in one atomic, history-preserving commit. The
    // oracle reconstructs the same partition swap relationally.
    Q.staged("q_lake_dynamic",
      setup = (s, d) => {
        // Table build (namespace, DDL, base INSERT, replacement view)
        // is STAGING — the benched verb below is the dynamic overwrite
        // + the readback, nothing else (round-7 advice: the old shape
        // timed the whole build and doubled on load).
        val tbl = "graft_cat.qdyn.orders_dynpart"
        val ord = t(s, d, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.qdyn")
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        ord.where(pmod(col("o_orderkey"), lit(3)) === 0)
          .createOrReplaceTempView("qdyn_base")
        s.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderpriority STRING) PARTITIONED BY (o_orderpriority)")
        s.sql(s"INSERT INTO $tbl SELECT * FROM qdyn_base")
        ord.where(pmod(col("o_orderkey"), lit(3)) === 1 &&
            col("o_orderpriority").isin("1-URGENT", "3-MEDIUM"))
          .createOrReplaceTempView("qdyn_repl")
      },
      verb = (s, _) => {
        val tbl = "graft_cat.qdyn.orders_dynpart"
        val key = "spark.sql.sources.partitionOverwriteMode"
        val old = s.conf.getOption(key)
        s.conf.set(key, "dynamic")
        try s.sql(s"INSERT OVERWRITE $tbl SELECT * FROM qdyn_repl")
        finally old match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
        s.table(tbl)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice") + 1e-6, 2).as("rev"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""WITH st AS (
             |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
             |  WHERE o_orderkey % 3 = 0 AND o_orderpriority NOT IN ('1-URGENT','3-MEDIUM')
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
             |  WHERE o_orderkey % 3 = 1 AND o_orderpriority IN ('1-URGENT','3-MEDIUM'))
             |SELECT o_orderpriority, count(*) AS cnt,
             |round(sum(o_totalprice)+1e-6,2) AS rev
             |FROM st GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B18: stats-based point/range lookup — the Doris-style serving
    // path. The table is range-laid-out on the key at write time, so
    // each file covers a narrow key interval; readRange consults the
    // per-file min/max harvested from parquet footers at commit time
    // and opens only the files whose interval intersects the probe
    // (spec asserts the skip; this oracle proves exactness).
    Q.staged("q_point_lookup",
      setup = (s, d) => LakeTable.create(s, s"$scratch/orders_point",
        t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .repartitionByRange(16, col("o_orderkey"))),
      verb = (s, _) =>
        LakeTable.readRange(s, s"$scratch/orders_point", "o_orderkey", 1000L, 1999L)
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev")),
      oracle = Some("""SELECT count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_orderkey BETWEEN 1000 AND 1999""".stripMargin)),

    // B26: aggregate-key-model ingest (Doris AGGREGATE table model):
    // two batches of per-priority partials land by COMBINING on the
    // key (measures sum) — the table stays one row per key with
    // running totals, and reading it equals aggregating the union of
    // everything ever ingested (the oracle). The ingest shuffle
    // carries only pre-aggregated partials, never raw facts.
    Q("q_lake_aggmerge",
      (s, d) => {
        val lake = s"$scratch/metrics_agg"
        val base = t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        def batch(lo: Long, hi: Long) =
          base.where(col("o_orderkey").between(lo, hi))
            .groupBy("o_orderpriority")
            .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("rev"))
        LakeTable.create(s, lake, batch(0, 999))
        LakeTable.mergeAggregate(s, lake, batch(1000, 1499),
          keys = Seq("o_orderpriority"), sumCols = Seq("cnt", "rev"))
        LakeTable.read(s, lake)
          .select(col("o_orderpriority"), col("cnt"),
            round(col("rev") + lit(1e-6), 2).as("rev"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |round(sum(o_totalprice)+1e-6,2) AS rev
             |FROM orders WHERE o_orderkey < 1500
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B25: zero-copy shallow clone — dev/test sandboxing of a
    // production table without copying 100 TB: the clone's v0 commit
    // points at the source's file groups by absolute path, then the
    // clone takes an append the SOURCE must not see. The gate checks
    // both sides' aggregates, proving shared-read + independent
    // evolution.
    Q("q_lake_clone",
      (s, d) => {
        val src = s"$scratch/orders_clone_src"
        val dst = s"$scratch/orders_clone_dst"
        val base = t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        LakeTable.create(s, src, base.where(col("o_orderkey") < 1000))
        LakeTable.shallowClone(s, src, dst)
        LakeTable.append(s, dst, base.where(col("o_orderkey").between(1000, 1199)))
        val srcAgg = LakeTable.read(s, src)
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice") + lit(1e-6), 2).as("rev"))
          .select(lit("source").as("side"), col("cnt"), col("rev"))
        val dstAgg = LakeTable.read(s, dst)
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice") + lit(1e-6), 2).as("rev"))
          .select(lit("clone").as("side"), col("cnt"), col("rev"))
        dstAgg.union(srcAgg).orderBy("side")
      },
      Some("""SELECT 'clone' AS side, count(*) AS cnt, round(sum(o_totalprice)+1e-6,2) AS rev
             |FROM orders WHERE o_orderkey < 1200
             |UNION ALL
             |SELECT 'source', count(*), round(sum(o_totalprice)+1e-6,2)
             |FROM orders WHERE o_orderkey < 1000
             |ORDER BY 1""".stripMargin)),

    // B24: incremental MV refresh FROM THE CHANGE FEED — the reason a
    // CDC contract exists. The rollup of v0 is materialized once;
    // after a DELETE and a MERGE mutate the base, the rollup refreshes
    // by folding the preimage-bearing feed algebraically (+ for
    // insert/update_postimage, − for delete/update_preimage) — the
    // base is NEVER rescanned. At 100 TB this is the difference
    // between an MV refresh proportional to the change set and one
    // proportional to the table. Oracle recomputes the final state
    // directly, so the gate proves incremental == direct.
    Q("q_mv_cdc_refresh",
      (s, d) => {
        val lake = s"$scratch/orders_cdc_mv"
        val mvPath = s"$scratch/orders_cdc_mv_rollup"
        val base = t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        LakeTable.create(s, lake, base.where(col("o_orderkey") < 1200))
        LakeTable.create(s, mvPath,
          LakeTable.read(s, lake).groupBy("o_orderpriority")
            .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("rev")))
        LakeTable.delete(s, lake, col("o_orderkey") < 100)
        LakeTable.merge(s, lake,
          base.where(col("o_orderkey").between(1000, 1399))
            .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
          "o_orderkey")
        val sign = when(col("change_type").isin("insert", "update_postimage"), 1)
          .otherwise(-1)
        val delta = LakeTable.changes(s, lake, "o_orderkey", 0L, 2L, preimages = true)
          .groupBy("o_orderpriority")
          .agg(sum(sign).as("dcnt"), sum(sign * col("o_totalprice")).as("drev"))
        LakeTable.read(s, mvPath)
          .join(delta, Seq("o_orderpriority"), "full")
          .select(col("o_orderpriority"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("cnt"),
            round(coalesce(col("rev"), lit(0.0)) + coalesce(col("drev"), lit(0.0))
              + lit(1e-6), 2).as("rev"))
          .where(col("cnt") > 0)
          .orderBy("o_orderpriority")
      },
      Some("""WITH final AS (
             |  SELECT o_orderpriority, o_totalprice AS p FROM orders
             |  WHERE o_orderkey BETWEEN 100 AND 999
             |  UNION ALL
             |  SELECT o_orderpriority, round(o_totalprice*2,2) FROM orders
             |  WHERE o_orderkey BETWEEN 1000 AND 1399)
             |SELECT o_orderpriority, count(*) AS cnt, round(sum(p)+1e-6,2) AS rev
             |FROM final GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B23: distinct-counting MV rollup — the capability a plain
    // sum/min/max rollup CANNOT serve, because count(distinct) is not
    // algebraic. HLL sketch partials make it mergeable: the MV stores
    // one fixed-size sketch per (event_type, day), and ANY coarser
    // grouping re-aggregates by sketch union without rescanning the
    // fact — the Doris bitmap/HLL-rollup serving trick. lgK=21 keeps
    // the sketch in its exact regime for these cardinalities, so the
    // served estimate hash-matches the oracle's true count(DISTINCT);
    // at genuinely-huge cardinalities the same plan degrades to ±~1%
    // instead of degrading to a fact rescan.
    Q("q_mv_distinct",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id"))
        val mvPath = s"$scratch/mv_events_hll"
        LakeTable.create(s, mvPath,
          ev.groupBy("event_type", "day")
            .agg(hll_sketch_agg(col("user_id"), lit(21)).as("hll_users"),
              count(lit(1)).as("cnt")))
        LakeTable.read(s, mvPath)
          .groupBy("event_type")
          .agg(hll_sketch_estimate(hll_union_agg(col("hll_users"), lit(true)))
            .as("approx_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS approx_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B41: EXACT distinct-counting MV rollup via Roaring bitmap
    // partials — the Doris BITMAP_UNION aggregate-model capability
    // (the deployed OLAP engine's signature exact-distinct serving
    // path, which its HLL columns only approximate). The MV stores one
    // compressed bitmap blob per (event_type, day); ANY coarser
    // grouping OR-merges blobs — never rescanning the fact — and the
    // answer is exact at every cardinality, not just in a sketch's
    // sparse regime. Partials are mergeable (TypedImperativeAggregate
    // → ObjectHashAggregate, map-side combine), so the fact shuffle
    // carries one blob per group per partition.
    Q("q_mv_bitmap",
      (s, d) => {
        import graft.functions.Bitmaps
        val ev = t(s, d, "events")
          .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id"))
        val mvPath = s"$scratch/mv_events_bitmap"
        LakeTable.create(s, mvPath,
          ev.groupBy("event_type", "day")
            .agg(Bitmaps.bitmapBuild(col("user_id")).as("bm_users"),
              count(lit(1)).as("cnt")))
        LakeTable.read(s, mvPath)
          .groupBy("event_type")
          .agg(Bitmaps.bitmapCount(Bitmaps.bitmapUnion(col("bm_users")))
            .as("exact_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B42: inverted-index keyword search — the Doris inverted-index /
    // MATCH_ALL capability (and the Hive+ES pattern the reference
    // stack serves search from). Build: one corpus pass tokenizes
    // map-side and aggregates token → Roaring bitmap of doc_ids, the
    // posting lists persisted as a LakeTable (compressed blobs; the
    // big corpus never shuffles text, only (token, doc_id) pairs).
    // Query: a pushed point-filter reads ONLY the query terms' rows —
    // file-skipping applies like any point lookup — then one
    // AND-aggregate intersects the posting bitmaps and the bounded
    // match set explodes to ids that broadcast-semi-join the corpus.
    // Query cost tracks the query terms' posting sizes, never corpus
    // size.
    Q("q_text_search",
      (s, d) => {
        import graft.functions.Bitmaps
        val terms = Seq("vector", "merge", "window")
        val idxPath = s"$scratch/text_inverted_idx"
        val docs = t(s, d, "documents")
        LakeTable.create(s, idxPath,
          docs.select(col("doc_id"),
              explode(array_distinct(filter(split(lower(col("text")), " "),
                x => x =!= ""))).as("term"))
            .groupBy("term")
            .agg(Bitmaps.bitmapBuild(col("doc_id")).as("bm"),
              count(lit(1)).as("df")))
        val matched = LakeTable.read(s, idxPath)
          .where(col("term").isin(terms: _*))
          .agg(Bitmaps.bitmapIntersect(col("bm")).as("bm"))
          .select(explode(Bitmaps.bitmapToArray(col("bm"))).as("doc_id"))
        docs.join(broadcast(matched), "doc_id")
          .select("doc_id", "lang", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars FROM (
             |  SELECT doc_id, lang, n_chars,
             |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
             |  FROM documents)
             |WHERE list_contains(tk, 'vector') AND list_contains(tk, 'merge')
             |  AND list_contains(tk, 'window')
             |ORDER BY doc_id""".stripMargin)),

    // B22: change data feed (Delta-CDF/Iceberg-changelog capability):
    // diff two snapshots into insert/update/delete records for
    // incremental downstream consumers. v0 = orderkey<1200; a DELETE
    // (v1) drops keys<100; a MERGE (v2) doubles prices for
    // 1000..1199 and inserts 1200..1399 — changes(0,2) must emit
    // exactly those three groups. One keyed shuffle per side, 8-byte
    // row hashes for change detection.
    Q("q_lake_cdc",
      (s, d) => {
        val lake = s"$scratch/orders_cdc"
        val base = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        LakeTable.create(s, lake, base.where(col("o_orderkey") < 1200))
        LakeTable.delete(s, lake, col("o_orderkey") < 100)
        LakeTable.merge(s, lake,
          base.where(col("o_orderkey").between(1000, 1399))
            .withColumn("o_totalprice", round(col("o_totalprice") * 2, 2)),
          "o_orderkey")
        LakeTable.changes(s, lake, "o_orderkey", 0L, 2L)
          .select(col("change_type"), col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice"), 2).as("price"))
          .orderBy("change_type", "o_orderkey")
      },
      Some("""SELECT 'delete' AS change_type, o_orderkey, o_custkey,
             |       round(o_totalprice,2) AS price FROM orders WHERE o_orderkey < 100
             |UNION ALL
             |SELECT 'insert', o_orderkey, o_custkey, round(o_totalprice*2,2)
             |FROM orders WHERE o_orderkey BETWEEN 1200 AND 1399
             |UNION ALL
             |SELECT 'update', o_orderkey, o_custkey, round(o_totalprice*2,2)
             |FROM orders WHERE o_orderkey BETWEEN 1000 AND 1199
             |ORDER BY 1, 2""".stripMargin)),

    // B21: bloom-sidecar point lookup on an UNCLUSTERED column. The
    // table is range-laid-out by date, so every file's o_orderkey
    // [min,max] spans the whole domain and footer stats skip nothing;
    // the per-file blooms answer "definitely absent" and the lookup
    // opens ~1 of 16 files (spec-asserted). This is the second
    // skipping tier a Doris-class serving layer adds over min/max.
    Q("q_bloom_lookup",
      (s, d) => {
        val lake = s"$scratch/orders_bloom"
        LakeTable.create(s, lake,
          t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
            .repartitionByRange(16, col("o_orderdate")))
        LakeTable.buildBlooms(s, lake, Seq("o_orderkey"))
        LakeTable.readPoint(s, lake, "o_orderkey", 1000L)
          .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
             |FROM orders WHERE o_orderkey = 1000""".stripMargin)),

    // B19: transparent MV routing (the Doris rollup-serving trick): a
    // registered sum/min/max/cnt partials table answers a plain
    // aggregate over the BASE fact — the query below groups coarser
    // than the MV dims and never scans orders (PlanSpec proves the
    // scan is the MV path). The oracle computes the same answer from
    // the base, so the gate proves routed == direct.
    Q("q_mv_autoroute",
      (s, d) => {
        // Register under a scratch COPY of the base, never the shared
        // corpus path: MvRegistry is process-global, and an entry on
        // the corpus orders table would silently route every later
        // matching aggregate in the same session through the MV
        // (correct but timing-contaminating — ADVICE r2). The copy is
        // rewritten per call so a stale copy from another SF dir can
        // never serve.
        val base = s"$scratch/mv_orders_base"
        t(s, d, "orders").write.mode("overwrite").parquet(base)
        graft.sources.Rollup.createAndRegister(s, base, s"$scratch/mv_orders_auto",
          dims = Seq("o_orderpriority", "o_orderstatus"), measures = Seq("o_totalprice"))
        s.read.parquet(base)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"),
            round(max("o_totalprice"), 2).as("top"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice),2) AS rev,
             |round(max(o_totalprice),2) AS top
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B07: catalog — create two tables (one bumped to v1), list them.
    Q("q_catalog",
      (s, d) => {
        val root = s"$scratch/catalog_demo"
        val cat = new LakeCatalog(s, root)
        cat.createTable("dim_region", t(s, d, "region"))
        cat.createTable("dim_nation", t(s, d, "nation"))
        LakeTable.append(s, s"$root/dim_nation", t(s, d, "nation"))
        cat.listTables().orderBy("table_name")
      },
      None),
  )
}
