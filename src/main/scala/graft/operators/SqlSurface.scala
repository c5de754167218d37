package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Q, Tables}
import graft.sources.LakeTable

/** DDL/DML SQL surface, additional file formats, typed JSON, ALL set
  * ops, and the Doris-style materialized-rollup serving pattern
  * (reference: doris.go deploys the OLAP engine whose core trick is
  * pre-aggregated rollups answering coarse queries).
  */
object SqlSurface {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val qs: Seq[Q] = Seq(

    // A49: DDL + DML through text SQL — CREATE TABLE ... USING parquet
    // at an external location, two INSERT INTO ... SELECTs, query back.
    Q("q_sql_ddl",
      (s, d) => {
        val loc = s"${Lakehouse.scratch}/ddl_demo"
        val fs = new org.apache.hadoop.fs.Path(loc)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(loc), true)
        s.sql("DROP TABLE IF EXISTS g_ddl_demo")
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(s"CREATE TABLE g_ddl_demo (k BIGINT, price DOUBLE) USING parquet LOCATION '$loc'")
        s.sql("INSERT INTO g_ddl_demo SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0")
        s.sql("INSERT INTO g_ddl_demo SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 1")
        s.sql("SELECT count(*) AS cnt, round(sum(price), 2) AS rev FROM g_ddl_demo")
      },
      Some("""SELECT count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_orderkey % 10 IN (0, 1)""".stripMargin)),

    // B09: CSV round trip (header + explicit schema on read).
    Q("q_csv_roundtrip",
      (s, d) => {
        val dir = s"${Lakehouse.scratch}/customer_csv"
        t(s, d, "customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
          .write.mode("overwrite").option("header", "true").csv(dir)
        s.read.option("header", "true")
          .schema("c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE")
          .csv(dir)
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B20: malformed-record tolerance on ingest — a corrupt file lands
    // in the same directory as clean CSV; DROPMALFORMED parses past it
    // and the aggregate equals the clean source exactly (the oracle
    // proves no clean row was lost and no corrupt row leaked in).
    // PERMISSIVE + columnNameOfCorruptRecord is the triage variant.
    Q("q_csv_malformed",
      (s, d) => {
        val dir = s"${Lakehouse.scratch}/customer_csv_bad"
        t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
          .write.mode("overwrite").option("header", "true").csv(dir)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val bad = fs.create(new org.apache.hadoop.fs.Path(dir, "part-corrupt.csv"), true)
        try bad.write(
          // Type garbage is what the univocity parser reliably rejects;
          // short rows are null-padded and extra columns truncated, so
          // they would NOT count as malformed.
          ("c_custkey,c_name,c_acctbal\n" +      // header (skipped per file)
            "not_a_number,Broken Row,xx\n" +     // unparseable bigint+double
            "12.5,Bad Key,abc\n")                // fractional key, bad double
            .getBytes("UTF-8"))
        finally bad.close()
        s.read.option("header", "true").option("mode", "DROPMALFORMED")
          .schema("c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE")
          .csv(dir)
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
      },
      Some("""SELECT count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM customer""".stripMargin)),

    // B10: JSON-lines round trip.
    Q("q_jsonl_roundtrip",
      (s, d) => {
        val dir = s"${Lakehouse.scratch}/part_jsonl"
        t(s, d, "part").select("p_partkey", "p_brand", "p_size", "p_retailprice")
          .write.mode("overwrite").json(dir)
        s.read.schema("p_partkey BIGINT, p_brand STRING, p_size BIGINT, p_retailprice DOUBLE")
          .json(dir)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("cnt"), round(avg("p_retailprice"), 2).as("avg_price"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS cnt, round(avg(p_retailprice),2) AS avg_price
             |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A50: schema-typed JSON parsing (from_json struct extraction, vs
    // A44's path-based get_json_object).
    Q("q_json_typed",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), lit("k BIGINT")).as("p"))
        .select(col("event_id"), col("p.k").as("k"))
        .where(col("k") > 50)
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
             |FROM events WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) > 50
             |ORDER BY event_id""".stripMargin)),

    // A61: correlated LATERAL subquery — per-customer best order via
    // a dependent join (decorrelated by Catalyst into a ranked join).
    // The outer `c_custkey <= 200` is mirrored onto the correlated
    // side (`o_custkey <= 200`): Catalyst does not push the outer
    // filter below the decorrelated WindowGroupLimit, so without it
    // the orders side computes top-1 for EVERY customer and then
    // discards all but 200 — a full-fact window at scale.
    Q("q_lateral",
      (s, d) => GraftSession.sql(s, d,
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c.c_custkey AND o_custkey <= 200
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
          |WHERE c.c_custkey <= 200
          |ORDER BY c.c_custkey""".stripMargin),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_custkey = c.c_custkey AND o_custkey <= 200
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
             |WHERE c.c_custkey <= 200
             |ORDER BY c.c_custkey""".stripMargin)),

    // A66: VARIANT semi-structured type (new in Spark 4): parse_json
    // into the binary variant encoding, typed path extraction with
    // variant_get — the open-schema alternative to from_json when the
    // shape isn't known up front. parse_json is MATERIALIZED once at a
    // projection boundary (§6.5.1): extracting from the attribute
    // parses each row's JSON a single time, where inlining the parse
    // into all three extractions (plus the filter's re-expansion of
    // the first) parsed it up to four times — measured 3.1 s vs
    // ~0.8 s at sf0.1. Oracle extracts the same path textually.
    Q("q_variant",
      (s, d) => Tables.fan(t(s, d, "events").select("event_id", "props"))
        .withColumn("var", parse_json(col("props")))
        .select(col("event_id"),
          variant_get(col("var"), "$.k", "bigint").as("k"),
          variant_get(col("var"), "$.k", "string").as("kstr"),
          to_json(col("var")).as("canon"))
        .where(col("k").between(10, 60))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
             |regexp_extract(props, '"k": (\d+)', 1) AS kstr,
             |replace(props, ': ', ':') AS canon
             |FROM events
             |WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) BETWEEN 10 AND 60
             |ORDER BY event_id""".stripMargin)),

    // A51/A52: multiset set ops (keep duplicates).
    Q("q_intersect_all",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("k"))
        .intersectAll(t(s, d, "lineitem").select(col("l_suppkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k"),
      Some("""SELECT k, count(*) AS cnt FROM (
             |SELECT o_custkey AS k FROM orders INTERSECT ALL
             |SELECT l_suppkey FROM lineitem) GROUP BY k ORDER BY k""".stripMargin)),

    Q("q_except_all",
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("k"))
        .exceptAll(t(s, d, "customer").select(col("c_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("cnt")).orderBy("k").limit(100),
      Some("""SELECT k, count(*) AS cnt FROM (
             |SELECT o_custkey AS k FROM orders EXCEPT ALL
             |SELECT c_custkey FROM customer) GROUP BY k ORDER BY k LIMIT 100""".stripMargin)),

    // B16: the named-table catalog surface (metastore capability,
    // reference internal/controller/metastore.go): CTAS into the
    // graft_cat catalog plugin, then pure text SQL against the
    // catalog-qualified name — resolution, V2 parquet scan with
    // pushdown, and the LakeTable commit protocol all through
    // `graft_cat.db.t`, no temp views.
    Q.staged("q_catalog_sql",
      setup = (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.orders_cat")
        s.sql("""CREATE TABLE graft_cat.db.orders_cat AS
                |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""".stripMargin)
      },
      verb = (s, _) =>
        s.sql("""SELECT o_orderstatus, count(*) AS cnt,
                |round(sum(o_totalprice), 2) AS rev
                |FROM graft_cat.db.orders_cat
                |WHERE o_totalprice > 150000
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      oracle = Some("""SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_totalprice > 150000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B32 oracle gate: SHOW PARTITIONS against a catalog-SQL
    // partitioned CTAS — the partition listing must equal DuckDB's
    // DISTINCT over the partition column, pinning both the partition
    // management surface and the hive-style name rendering.
    Q.staged("q_show_partitions",
      setup = (s, d) => {
        t(s, d, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
          .createOrReplaceTempView("orders_sp_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.orders_sp")
        s.sql("""CREATE TABLE graft_cat.db.orders_sp
                |PARTITIONED BY (o_orderpriority) AS
                |SELECT o_orderkey, o_totalprice, o_orderpriority
                |FROM orders_sp_src""".stripMargin)
      },
      verb = (s, _) =>
        s.sql("SHOW PARTITIONS graft_cat.db.orders_sp").orderBy("partition"),
      oracle = Some("""SELECT 'o_orderpriority=' || o_orderpriority AS "partition"
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B53 oracle gate: the graft_files metadata TVF reconciled against
    // DuckDB ground truth — two repartition(1) writes of `region`
    // leave exactly 2 live files per partition leaf, every file's
    // listed bytes are positive, no deletion vectors, and the
    // partition-wise ROW counts served off those live files equal
    // 2x the source's. A files listing that leaks dead files, misses a
    // commit, or mislabels groups breaks the file count; a read path
    // disagreeing with the listing breaks the row counts.
    Q.staged("q_graft_files",
      setup = (s, d) => {
        val p = s"${Lakehouse.scratch}/files_check"
        LakeTable.create(s, p, t(s, d, "region").repartition(1),
          partitionBy = Seq("r_regionkey"))
        LakeTable.append(s, p, t(s, d, "region").repartition(1))
      },
      verb = (s, _) => {
        val p = s"${Lakehouse.scratch}/files_check"
        val files = s.sql(s"SELECT * FROM graft_files('$p')")
          .withColumn("r_regionkey",
            regexp_extract(concat_ws("/", col("file_group"), col("file")),
              "r_regionkey=(\\d+)", 1).cast("long"))
          .groupBy("r_regionkey")
          .agg(count(lit(1)).cast("long").as("files"),
            (min(col("bytes")) > 0L).as("bytes_positive"),
            (max(col("has_deletes").cast("int")) === 0).as("no_deletes"))
        val rows = LakeTable.read(s, p).groupBy("r_regionkey")
          .agg(count(lit(1)).cast("long").as("row_count"))
        files.join(rows, "r_regionkey")
          .select(col("r_regionkey").cast("long").as("r_regionkey"),
            col("files"), col("bytes_positive"), col("no_deletes"), col("row_count"))
          .orderBy("r_regionkey")
      },
      oracle = Some("""SELECT r_regionkey::BIGINT AS r_regionkey,
             |  2::BIGINT AS files,
             |  CAST(1 AS BOOLEAN) AS bytes_positive,
             |  CAST(1 AS BOOLEAN) AS no_deletes,
             |  2::BIGINT AS row_count
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    // B29 oracle gate: DESCRIBE HISTORY over a staged create → append
    // → append → merge → compact ladder. Version numbering, action
    // names, and the file-group count per commit (append adds a group,
    // merge on an all-matching key collapses to its one rewrite,
    // compact folds to one) are all deterministic; wall-clock
    // timestamps are projected out. A history that drops a commit,
    // mislabels an action, or miscounts groups breaks the ladder.
    Q.staged("q_describe_history",
      setup = (s, d) => {
        val p = s"${Lakehouse.scratch}/history_check"
        def region = t(s, d, "region").repartition(1)
        LakeTable.create(s, p, region)
        LakeTable.append(s, p, region)
        LakeTable.append(s, p, region)
        LakeTable.merge(s, p, region, "r_regionkey")
        LakeTable.compact(s, p, 1)
      },
      verb = (s, _) =>
        LakeTable.history(s, s"${Lakehouse.scratch}/history_check")
          .select(col("version"), col("action"),
            col("n_file_groups"), col("has_change_data"))
          .orderBy("version"),
      oracle = Some("""SELECT version::BIGINT AS version, action,
             |  n_file_groups::BIGINT AS n_file_groups,
             |  CAST(0 AS BOOLEAN) AS has_change_data
             |FROM (VALUES (0, 'create', 1), (1, 'append', 2), (2, 'append', 3),
             |             (3, 'merge', 1), (4, 'compact', 1))
             |  AS t(version, action, n_file_groups)
             |ORDER BY version""".stripMargin)),

    // B35 oracle gate: the graft_history TVF through catalog SQL — a
    // CTAS (create + its data append) plus two INSERTs must serve the
    // exact commit ladder in pure SQL, newest-first reordered by the
    // query. Pins both the TVF injection and the db.table target
    // resolution under the warehouse root.
    Q.staged("q_graft_history",
      setup = (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("nation_gh_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.nation_gh")
        s.sql("CREATE TABLE graft_cat.db.nation_gh AS " +
          "SELECT n_nationkey, n_name FROM nation_gh_src")
        s.sql("INSERT INTO graft_cat.db.nation_gh VALUES (100, 'atlantis')")
        s.sql("INSERT INTO graft_cat.db.nation_gh VALUES (101, 'lemuria')")
      },
      verb = (s, _) =>
        s.sql("""SELECT version, action, n_file_groups, has_change_data
                |FROM graft_history('db.nation_gh') ORDER BY version""".stripMargin),
      oracle = Some("""SELECT version::BIGINT AS version, action,
             |  n_file_groups::BIGINT AS n_file_groups,
             |  CAST(0 AS BOOLEAN) AS has_change_data
             |FROM (VALUES (0, 'create', 1), (1, 'append', 2),
             |             (2, 'append', 3), (3, 'append', 4))
             |  AS t(version, action, n_file_groups)
             |ORDER BY version""".stripMargin)),

    // B17: JDBC source federation (the platform's PostgreSQL leg,
    // reference internal/controller/postgresql.go) against embedded
    // Derby — the only RDBMS in the sandbox. Stage a dimension slice
    // into the database over JDBC, read it back through spark.read.jdbc
    // (predicate pushdown into the remote SQL), join it to the parquet
    // fact table. At scale the JDBC side is the small federated dim —
    // broadcast — and `partitionColumn/numPartitions` shards bigger
    // pulls; the fact never leaves the lake.
    Q("q_jdbc_federation",
      (s, d) => {
        val url = s"jdbc:derby:${Lakehouse.scratch}/derby_fed;create=true"
        val props = new java.util.Properties()
        props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").jdbc(url, "NATION_DIM", props)
        val dim = s.read.jdbc(url, "NATION_DIM", props)
          .where(col("n_regionkey") <= 2)
        t(s, d, "customer")
          .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |WHERE n_regionkey <= 2
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B11: materialized rollup serving (the Doris capability): a
    // pre-aggregated LakeTable answers the coarse query; correctness
    // gate proves MV-served == base-computed.
    Q("q_mv_rollup",
      (s, d) => {
        val mv = s"${Lakehouse.scratch}/mv_seg_status"
        val base = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "o_orderstatus")
          .agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("rev"))
        LakeTable.create(s, mv, base)
        // Serve the coarser rollup FROM the MV (no fact scan).
        LakeTable.read(s, mv)
          .groupBy("c_mktsegment")
          .agg(sum("cnt").as("cnt"), round(sum("rev"), 2).as("rev"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A72: WITH RECURSIVE through text SQL (Spark 4): multi-level
    // traversal of the implicit binary tree over customer keys
    // (children of k are 2k, 2k+1) — ~log2(N) recursion levels, each
    // one self-join of the frontier against the (pushdown-pruned)
    // customer scan. Strictly-increasing keys make it provably
    // acyclic. DuckDB runs the identical statement.
    Q("q_recursive_cte",
      (s, d) => {
        Tables(s, d, "customer").createOrReplaceTempView("customer")
        // Key cap bounds the recursion to ~12 levels regardless of SF:
        // each level is one frontier-joined scan, so unbounded depth
        // would grow the job count (not data volume) with log2(N).
        s.sql("""WITH RECURSIVE chain(k, depth) AS (
                |  SELECT CAST(1 AS BIGINT), 1
                |  UNION ALL
                |  SELECT c.c_custkey, chain.depth + 1
                |  FROM customer c JOIN chain
                |    ON c.c_custkey = 2 * chain.k OR c.c_custkey = 2 * chain.k + 1
                |  WHERE c.c_custkey < 4096
                |)
                |SELECT depth, count(*) AS cnt, min(k) AS min_k, max(k) AS max_k
                |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
      },
      Some("""WITH RECURSIVE chain(k, depth) AS (
             |  SELECT CAST(1 AS BIGINT), 1
             |  UNION ALL
             |  SELECT c.c_custkey, chain.depth + 1
             |  FROM customer c JOIN chain
             |    ON c.c_custkey = 2 * chain.k OR c.c_custkey = 2 * chain.k + 1
             |  WHERE c.c_custkey < 4096
             |)
             |SELECT depth, count(*)::BIGINT AS cnt, min(k) AS min_k, max(k) AS max_k
             |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)),

    // A73: error-safe expression surface (ANSI-adjacent `try_*`):
    // NULL instead of a runtime error on divide-by-zero, bad casts,
    // and bigint overflow — the semantics a shared SQL gateway needs
    // so one malformed row cannot kill a tenant's query. DuckDB
    // mirrors try_cast natively and the other two by construction.
    // Bounded to a fixed key range: try_* failure rows cost a caught
    // per-row exception (TryEval), so a query where MOST rows fail is
    // a pathology, not a pattern — the row gates the SEMANTICS
    // (null-on-error for all three families) on an SF-stable subset.
    Q("q_try_expr",
      (s, d) => Tables(s, d, "orders")
        .where(col("o_orderkey") < 1000)
        .selectExpr(
          "o_orderkey",
          "try_divide(o_totalprice, o_custkey % 3) AS safe_div",
          "try_cast(o_orderpriority AS INT) AS safe_cast",
          "try_add(9223372036854775807L, o_orderkey) AS safe_add")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  o_totalprice / nullif(o_custkey % 3, 0) AS safe_div,
             |  try_cast(o_orderpriority AS INT) AS safe_cast,
             |  CASE WHEN o_orderkey = 0 THEN 9223372036854775807 END AS safe_add
             |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)),

    // B30: SQL UPDATE over a catalog table — routed by GraftRowLevelSql
    // into the file-group-granular COW path (never Spark's full-table
    // ReplaceData), CDC-integrated, same pruning as the API verb.
    Q.staged("q_sql_update",
      setup = (s, d) => {
        t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
          .createOrReplaceTempView("cust_upd_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.cust_upd")
        s.sql("CREATE TABLE graft_cat.db.cust_upd AS SELECT * FROM cust_upd_src")
      },
      verb = (s, _) => {
        s.sql("""UPDATE graft_cat.db.cust_upd
                |SET c_acctbal = c_acctbal + 100.0 WHERE c_nationkey < 10""".stripMargin)
        s.sql("""SELECT c_nationkey, count(*) AS cnt,
                |round(sum(c_acctbal), 2) AS bal
                |FROM graft_cat.db.cust_upd
                |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
      },
      oracle = Some("""SELECT c_nationkey, count(*) AS cnt,
             |round(sum(CASE WHEN c_nationkey < 10 THEN c_acctbal + 100.0
             |               ELSE c_acctbal END), 2) AS bal
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B31: full SQL MERGE INTO — conditional DELETE, UPDATE, INSERT
    // clauses in one statement, one full-outer join on the key, with
    // the source's key range still pruning untouched file groups.
    Q.staged("q_sql_merge",
      setup = (s, d) => {
        t(s, d, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
          .createOrReplaceTempView("cust_mrg_base")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.cust_mrg")
        s.sql("CREATE TABLE graft_cat.db.cust_mrg AS SELECT * FROM cust_mrg_base")
        // the not-matched keys offset past the ACTUAL key domain — a
        // fixed +1000000 collided with ScaleGen's remapped keys at sf1
        // (duplicate source keys, which MERGE rightly refuses)
        s.sql("""SELECT c_custkey, c_nationkey, c_acctbal,
                |  (c_custkey % 13 = 0) AS del, 1000.0 AS delta
                |FROM cust_mrg_base WHERE c_custkey % 7 = 0 OR c_custkey % 13 = 0
                |UNION ALL
                |SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM cust_mrg_base),
                |  c_nationkey, c_acctbal, false, 0.0
                |FROM cust_mrg_base WHERE c_custkey % 11 = 0""".stripMargin)
          .createOrReplaceTempView("cust_mrg_src")
      },
      verb = (s, _) => {
        s.sql("""MERGE INTO graft_cat.db.cust_mrg AS tgt
                |USING cust_mrg_src AS src ON tgt.c_custkey = src.c_custkey
                |WHEN MATCHED AND src.del THEN DELETE
                |WHEN MATCHED THEN UPDATE SET c_acctbal = tgt.c_acctbal + src.delta
                |WHEN NOT MATCHED THEN INSERT (c_custkey, c_nationkey, c_acctbal)
                |  VALUES (src.c_custkey, src.c_nationkey, src.c_acctbal)""".stripMargin)
        s.sql("""SELECT c_nationkey, count(*) AS cnt,
                |round(sum(c_acctbal), 2) AS bal
                |FROM graft_cat.db.cust_mrg
                |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
      },
      oracle = Some("""WITH merged AS (
             |  SELECT c_custkey, c_nationkey,
             |    CASE WHEN c_custkey % 7 = 0 AND c_custkey % 13 <> 0
             |         THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal
             |  FROM customer WHERE c_custkey % 13 <> 0
             |  UNION ALL
             |  SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer),
             |    c_nationkey, c_acctbal
             |  FROM customer WHERE c_custkey % 11 = 0)
             |SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // B36: storage-partitioned join end-to-end — both tables
    // partitioned on the same derived bucket, the join covers the
    // partition key, so NEITHER side shuffles (KeyGroupedPartitioning
    // alignment; the no-Exchange plan shape is spec-pinned in
    // LakeTableSpec). The oracle recomputes the same join unbucketed.
    Q.staged("q_spj_join",
      setup = (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("spjq_cust_src")
        t(s, d, "orders").createOrReplaceTempView("spjq_ord_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.spj_cust")
        s.sql("DROP TABLE IF EXISTS graft_cat.db.spj_ord")
        s.sql("""CREATE TABLE graft_cat.db.spj_cust
                |(c_custkey BIGINT, c_acctbal DOUBLE, bucket STRING)
                |PARTITIONED BY (bucket)""".stripMargin)
        s.sql("""CREATE TABLE graft_cat.db.spj_ord
                |(o_custkey BIGINT, o_totalprice DOUBLE, bucket STRING)
                |PARTITIONED BY (bucket)""".stripMargin)
        s.sql("""INSERT INTO graft_cat.db.spj_cust
                |SELECT c_custkey, c_acctbal, CAST(c_custkey % 8 AS STRING)
                |FROM spjq_cust_src""".stripMargin)
        s.sql("""INSERT INTO graft_cat.db.spj_ord
                |SELECT o_custkey, o_totalprice, CAST(o_custkey % 8 AS STRING)
                |FROM spjq_ord_src""".stripMargin)
      },
      verb = (s, _) =>
        s.sql("""SELECT c.bucket, count(*) AS cnt,
                |round(sum(o.o_totalprice), 2) AS rev
                |FROM graft_cat.db.spj_cust c JOIN graft_cat.db.spj_ord o
                |ON c.bucket = o.bucket AND c.c_custkey = o.o_custkey
                |GROUP BY 1 ORDER BY 1""".stripMargin),
      oracle = Some("""SELECT CAST(c_custkey % 8 AS VARCHAR) AS bucket, count(*) AS cnt,
             |round(sum(o_totalprice), 2) AS rev
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A102: SQL scalar UDF (CREATE FUNCTION ... RETURN expr) — users
    // of the reference's JDBC gateway define reusable business
    // expressions in pure SQL. Spark inlines the SQL-UDF body into the
    // calling plan at analysis time, so the aggregate below is the
    // same whole-stage-codegen'd expression tree as writing the
    // formula inline — a UDF surface with ZERO execution cost at any
    // scale (vs a black-box Scala/Python UDF that breaks codegen and
    // pushdown). The oracle runs the inlined formula.
    Q("q_sql_udf",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_sqludf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(
                |  p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
                |RETURN p * (1.0 - disc) * (1.0 + tax)""".stripMargin)
        s.sql("""SELECT l_returnflag,
                |  round(sum(graft_charge(l_extendedprice, l_discount, l_tax)) + 1e-6, 2)
                |    AS sum_charge,
                |  count(*) AS n
                |FROM li_sqludf GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) + 1e-6, 2)
             |    AS sum_charge,
             |  count(*)::BIGINT AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A103: SQL table function (CREATE FUNCTION ... RETURNS TABLE) —
    // a parameterized view: the body is a full query inlined at
    // analysis time wherever the function appears in FROM, so
    // pushdown/pruning see through it exactly as through a view.
    Q("q_sql_udtf",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_sqludtf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION flag_parts(fl STRING)
                |RETURNS TABLE(l_partkey BIGINT, qty DOUBLE)
                |RETURN SELECT l_partkey, sum(l_quantity) AS qty
                |  FROM li_sqludtf WHERE l_returnflag = fl
                |  GROUP BY l_partkey ORDER BY qty DESC, l_partkey LIMIT 10""".stripMargin)
        s.sql("SELECT l_partkey, qty FROM flag_parts('A') ORDER BY qty DESC, l_partkey")
      },
      Some("""SELECT l_partkey, qty FROM (
             |  SELECT l_partkey, sum(l_quantity) AS qty
             |  FROM lineitem WHERE l_returnflag = 'A'
             |  GROUP BY l_partkey ORDER BY qty DESC, l_partkey LIMIT 10)
             |ORDER BY qty DESC, l_partkey""".stripMargin)),

    // A104: the SQL PIVOT clause (the DataFrame pivot — A29 — reaches
    // SQL users through the gateway as syntax). Same execution shape:
    // one aggregate with a CASE per pivoted value, no extra pass. The
    // oracle spells out the CASE form, pinning the rotation itself.
    Q("q_sql_pivot",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("ord_pivot")
        s.sql("""SELECT * FROM (
                |  SELECT o_orderpriority, o_orderstatus, o_totalprice
                |  FROM ord_pivot)
                |PIVOT (round(sum(o_totalprice), 2)
                |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority,
             |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS f,
             |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS o,
             |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS p
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A105: parameterized SQL — the injection-safe query surface every
    // JDBC/gateway client should use: named :params bind server-side
    // as LITERALS in the analyzed plan (never string-spliced), so the
    // same text caches/plans identically across argument values and a
    // malicious string argument cannot change the query's shape.
    Q("q_sql_params",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("cust_params")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
            |FROM cust_params
            |WHERE c_acctbal > :minBal AND c_mktsegment <> :skipSeg
            |GROUP BY 1 ORDER BY 1""".stripMargin,
          Map("minBal" -> 1000, "skipSeg" -> "MACHINERY"))
      },
      Some("""SELECT c_mktsegment, count(*)::BIGINT AS n,
             |round(sum(c_acctbal), 2) AS bal
             |FROM customer
             |WHERE c_acctbal > 1000 AND c_mktsegment <> 'MACHINERY'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
