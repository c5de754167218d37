package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Q, Tables}

/** Coverage beyond SURVEY §2's original table: the raw SQL gateway
  * surface (Kyuubi capability — text SQL in, DataFrame out), ORC as a
  * second columnar format (the reference metastore serves ORC Hive
  * tables), distribution window functions, lateral explode, and
  * sketch-based quantiles.
  */
object Extras {

  /** Typed row for the Dataset-API surface (A55). */
  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val qs: Seq[Q] = Seq(

    // A45: the SQL-gateway path end-to-end — text SQL with joins,
    // aggregation, HAVING, ORDER BY through spark.sql over registered
    // views. The oracle is the same statement modulo dialect.
    Q.staged("q_sql_interface",
      setup = (s, d) => GraftSession.registerViews(s, d),
      verb = (s, _) => s.sql(
        """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name HAVING count(*) > 10
          |ORDER BY bal DESC, n_name""".stripMargin),
      oracle = Some("""SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name HAVING count(*) > 10
             |ORDER BY bal DESC, n_name""".stripMargin)),

    // A83: modern grouping sugar — GROUP BY ALL / ORDER BY ALL infer
    // the non-aggregate columns; identical statement runs in DuckDB.
    Q("q_group_by_all",
      (s, d) => GraftSession.sql(s, d,
        """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
          |round(sum(o_totalprice) + 1e-6, 2) AS rev
          |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
             |round(sum(o_totalprice) + 1e-6, 2) AS rev
             |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // A84: IDENTIFIER() clause (Spark 4) — injection-safe dynamic
    // object names for a SQL gateway: the table name arrives as a
    // string PARAMETER, not string concatenation. DuckDB has no
    // IDENTIFIER clause; its oracle names the table directly (same
    // result, which is the point).
    Q("q_sql_identifier",
      (s, d) => {
        graft.Tables(s, d, "nation").createOrReplaceTempView("nation")
        s.sql("SELECT n_regionkey, count(*) AS cnt FROM IDENTIFIER(:tbl) " +
          "GROUP BY n_regionkey ORDER BY n_regionkey",
          Map("tbl" -> "nation"))
      },
      Some("""SELECT n_regionkey, count(*) AS cnt FROM nation
             |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // A85: observed metrics (Dataset.observe + Observation) — the
    // operational hook a gateway uses to account per-query row/byte
    // counts WITHOUT a second scan: metrics accumulate on the action
    // itself. The gate re-emits the observed values as a result row
    // and checks them against a direct aggregate.
    Q("q_observe",
      (s, d) => {
        import s.implicits._
        val obs = new org.apache.spark.sql.Observation("corpus_metrics")
        val df = t(s, d, "documents")
          .observe(obs, count(lit(1)).as("n_docs"),
            sum(length(col("text"))).cast("long").as("total_chars"))
        df.write.format("noop").mode("overwrite").save() // one pass, metrics ride along
        Seq((obs.get("n_docs").asInstanceOf[Long],
          obs.get("total_chars").asInstanceOf[Long])).toDF("n_docs", "total_chars")
      },
      Some("""SELECT count(*) AS n_docs,
             |sum(length(text))::BIGINT AS total_chars FROM documents""".stripMargin)),

    // B08: ORC round trip — write the supplier dim as ORC, read it
    // back, aggregate. Exercises the second columnar format's full
    // write + scan path (predicate pushdown works for ORC too).
    Q("q_orc_roundtrip",
      (s, d) => {
        val dir = s"${Lakehouse.scratch}/supplier_orc"
        t(s, d, "supplier").write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .where(col("s_acctbal") > 0)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("s_acctbal"), 2).as("bal"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS cnt, round(sum(s_acctbal),2) AS bal
             |FROM supplier WHERE s_acctbal > 0
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // B38: Avro round trip — the fourth row-format leg (the deployed
    // Hive/Spark stack reads Avro). One container file per partition
    // on write, one split per file on read, through graft's own
    // AvroIO (this distribution bundles the Avro runtime but not the
    // spark-avro connector). Values must survive exactly — the oracle
    // aggregates the original parquet.
    Q("q_avro_roundtrip",
      (s, d) => {
        val dir = s"${Lakehouse.scratch}/orders_avro"
        graft.sources.AvroIO.write(
          t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"), dir)
        graft.sources.AvroIO.read(s, dir)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |round(sum(o_totalprice),2) AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A46: distribution window functions — ntile, percent_rank,
    // cume_dist over order value per priority.
    Q("q_window_dist",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders").where(col("o_totalprice") > 400000)
          .select(col("o_orderpriority"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            // +1e-9 nudge: percent_rank = k/(n-1) lands exactly on
            // .xxxxxx5 boundaries where Spark (half-up) and DuckDB
            // (half-even) disagree; the shared nudge decides it.
            round(percent_rank().over(w) + lit(1e-9), 6).as("pr"),
            round(cume_dist().over(w) + lit(1e-9), 6).as("cd"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |ntile(4) OVER w AS quartile,
             |round(percent_rank() OVER w + 0.000000001, 6) AS pr,
             |round(cume_dist() OVER w + 0.000000001, 6) AS cd
             |FROM orders WHERE o_totalprice > 400000
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // A47: first/last value per group. A window (`first/last over
    // partitionBy(l_returnflag)`) would sort ALL of lineitem in 3
    // reducer partitions and then discard everything but 3 rows — a
    // single-reducer-per-flag scale-killer. first_value ordered by
    // shipdate IS min(shipdate), so the right plan is the map-side
    // partial aggregate (measured 1.8 s window vs 0.1 s agg at sf0.1;
    // PlanSpec pins HashAggregate-no-Window).
    Q("q_window_firstlast",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(min("l_shipdate").cast("date").as("first_ship"),
          max("l_shipdate").cast("date").as("last_ship"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(min(l_shipdate) AS DATE) AS first_ship,
             |CAST(max(l_shipdate) AS DATE) AS last_ship
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A48: lateral explode — one row per token with its position,
    // counted back per position bucket.
    Q("q_explode_tokens",
      (s, d) => t(s, d, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), posexplode(col("ws")))
        .where(col("pos") < 5)
        .groupBy("pos")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("col")).as("vocab"))
        .orderBy("pos"),
      Some("""WITH x AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             |  generate_subscripts(string_split(text, ' '), 1) - 1 AS pos FROM documents)
             |SELECT pos, count(*) AS cnt, count(DISTINCT tok) AS vocab
             |FROM x WHERE pos < 5 GROUP BY pos ORDER BY pos""".stripMargin)),

    // A53: FILTER-clause conditional aggregation.
    Q("q_agg_filter",
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          count(when(col("l_quantity") > 25, 1)).as("cnt_bulk"),
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2).as("rev_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |count(*) FILTER (l_quantity > 25) AS cnt_bulk,
             |round(sum(l_extendedprice) FILTER (l_discount > 0.05), 2) AS rev_disc
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A54: array surface — sort, slice, contains, join over token
    // arrays.
    Q("q_array_ops",
      (s, d) => t(s, d, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"),
          array_join(slice(array_sort(array_distinct(col("ws"))), 1, 3), ",").as("top3"),
          array_contains(col("ws"), "spark").as("has_spark"),
          size(col("ws")).cast("long").as("n"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |array_to_string(list_sort(list_distinct(string_split(text,' ')))[1:3], ',') AS top3,
             |list_contains(string_split(text,' '), 'spark') AS has_spark,
             |len(string_split(text,' ')) AS n
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // A62: explicit null ordering (NULLS FIRST/LAST on both ends).
    Q("q_null_ordering",
      (s, d) => t(s, d, "orders").where(col("o_orderkey") <= 200)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"))
        .orderBy(col("st").desc_nulls_first, col("o_orderkey").asc),
      Some("""SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
             |FROM orders WHERE o_orderkey <= 200
             |ORDER BY st DESC NULLS FIRST, o_orderkey""".stripMargin)),

    // A63: date/interval arithmetic — add days/months, truncate, diff.
    Q("q_interval_arith",
      (s, d) => t(s, d, "orders").where(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30d"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("1999-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_99"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30d,
             |CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
             |last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_99
             |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    // A64: RANGE-frame window over event time — trailing 7-day revenue
    // per ship day. The window input is the per-day pre-aggregate
    // (bounded by calendar days, NOT by SF), so the single-partition
    // ordered frame is over a few thousand rows at any corpus size —
    // the fact table itself never enters a global window.
    Q("q_window_range",
      (s, d) => {
        val daily = t(s, d, "lineitem")
          .groupBy(col("l_shipdate").cast("date").as("day"))
          .agg(sum("l_extendedprice").as("rev"))
        val w = Window.orderBy(datediff(col("day"), lit("1990-01-01").cast("date")))
          .rangeBetween(-6, 0)
        daily.select(col("day"),
          round(sum("rev").over(w) + lit(1e-6), 2).as("rev7"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
             |  sum(l_extendedprice) AS rev FROM lineitem GROUP BY 1)
             |SELECT day, round(sum(rev) OVER (ORDER BY day
             |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) + 0.000001, 2) AS rev7
             |FROM daily ORDER BY day""".stripMargin)),

    // A65: collation-aware grouping (Spark 4 COLLATE): mixed-case keys
    // group case-insensitively under UTF8_LCASE; the oracle emulates
    // with lower() (groups and counts must coincide exactly).
    Q("q_collation",
      (s, d) => t(s, d, "customer")
        .select(when(col("c_custkey") % 2 === 0, initcap(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")).as("seg"), col("c_acctbal"))
        .groupBy(expr("seg COLLATE UTF8_LCASE").as("seg_ci"))
        .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
        .select(lower(col("seg_ci")).as("seg"), col("cnt"), col("bal"))
        .orderBy("seg"),
      Some("""WITH x AS (SELECT CASE WHEN c_custkey % 2 = 0
             |  THEN upper(c_mktsegment[1]) || lower(c_mktsegment[2:]) ELSE c_mktsegment END AS seg,
             |  c_acctbal FROM customer)
             |SELECT lower(seg) AS seg, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM x GROUP BY lower(seg) ORDER BY seg""".stripMargin)),

    // A67: linear-regression aggregates (regr_slope/intercept/r2/count)
    // — price-vs-quantity fit per return flag. Algebraic single-pass
    // aggregates (co-moment merge), so they partial-aggregate map-side
    // like any sum; rounded with the shared nudge since the co-moment
    // accumulation order differs across engines in the last bits.
    Q("q_regr_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 4).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")) + lit(1e-9), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(regr_slope(l_extendedprice, l_quantity) + 0.000000001, 4) AS slope,
             |round(regr_intercept(l_extendedprice, l_quantity) + 0.000000001, 4) AS icept,
             |round(regr_r2(l_extendedprice, l_quantity) + 0.000000001, 6) AS r2,
             |regr_count(l_extendedprice, l_quantity)::BIGINT AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A56: ordered string aggregation (listagg / string_agg).
    Q("q_string_agg",
      (s, d) => t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list("n_name"))).as("nations"))
        .orderBy("n_regionkey"),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A57: unpivot (wide → long).
    Q("q_unpivot",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_discount"), 2).as("disc"),
          round(sum("l_tax"), 2).as("tax"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("disc"), col("tax")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"),
      Some("""WITH w AS (SELECT l_returnflag, round(sum(l_quantity),2) AS qty,
             |  round(sum(l_discount),2) AS disc, round(sum(l_tax),2) AS tax
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, measure, value FROM (
             |  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM w
             |  UNION ALL SELECT l_returnflag, 'disc', disc FROM w
             |  UNION ALL SELECT l_returnflag, 'tax', tax FROM w)
             |ORDER BY l_returnflag, measure""".stripMargin)),

    // A58: width_bucket histogram.
    Q("q_histogram",
      (s, d) => t(s, d, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0), lit(600000), lit(12)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket"),
      // DuckDB 1.0 has no width_bucket — spelled arithmetically.
      Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
             |WHEN o_totalprice >= 600000 THEN 13
             |ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
             |count(*) AS cnt FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A59: regexp_extract_all → per-doc numeric-token counts.
    Q("q_regexp_all",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          size(regexp_extract_all(col("props"), lit("\\d+"), lit(0))).cast("long").as("n_nums"),
          regexp_extract_all(col("props"), lit("\\d+"), lit(0))(0).cast("long").as("first_num"))
        .orderBy("event_id"),
      Some("""SELECT event_id, len(regexp_extract_all(props, '\d+')) AS n_nums,
             |CAST(regexp_extract_all(props, '\d+')[1] AS BIGINT) AS first_num
             |FROM events ORDER BY event_id""".stripMargin)),

    // A60: map construction + lookup (oracle spells the lookup as CASE).
    Q("q_map_ops",
      (s, d) => {
        val statusNames = map(
          lit("F"), lit("finished"), lit("O"), lit("open"), lit("P"), lit("pending"))
        t(s, d, "orders")
          .select(element_at(statusNames, col("o_orderstatus")).as("status_name"))
          .groupBy("status_name").agg(count(lit(1)).as("cnt"))
          .orderBy("status_name")
      },
      Some("""SELECT CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
             |WHEN 'P' THEN 'pending' END AS status_name, count(*) AS cnt
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A55: typed Dataset surface — case-class Encoders, compile-time
    // field access, typed filter/groupByKey/agg; the type-safe API a
    // Scala engineering team actually writes against.
    Q("q_typed_dataset",
      (s, d) => {
        import s.implicits._
        val orders = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .as[Extras.OrderRow]
        orders
          .filter(o => o.o_totalprice > 200000 && o.o_orderstatus != "P")
          .groupByKey(_.o_orderstatus)
          .mapGroups { (k, it) =>
            val prices = it.map(_.o_totalprice).toSeq
            val rev = BigDecimal(prices.sum + 1e-6)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
            (k, prices.size.toLong, rev)
          }
          .toDF("o_orderstatus", "cnt", "rev")
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt,
             |round(sum(o_totalprice) + 0.000001, 2) AS rev
             |FROM orders WHERE o_totalprice > 200000 AND o_orderstatus <> 'P'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // E12: custom whole-operator Catalyst extension — LogicalPlan +
    // planner Strategy + two-phase SparkPlan. Bounded per-group heaps
    // replace the window-sort: shuffle carries ≤ k rows per (group,
    // partition) instead of every row. Same result as row_number —
    // the oracle proves it.
    Q("q_topk_custom",
      (s, d) => graft.plans.TopK.perGroup(
        t(s, d, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice"),
        groupCols = Seq("o_orderpriority"), orderCol = "o_totalprice",
        tieCol = "o_orderkey", k = 3)
        .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey")),
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 3 ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin)),

    // E10: typed custom Aggregator (UDAF surface) — Welford one-pass
    // variance, merge-stable under Spark's partial aggregation; gated
    // against the built-in var_samp oracle.
    Q("q_udaf_welford",
      (s, d) => {
        val varUdaf = udaf(graft.functions.Aggregators.VarWelford)
        t(s, d, "lineitem").groupBy("l_returnflag")
          .agg(round(varUdaf(col("l_quantity")), 4).as("var_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, round(var_samp(l_quantity),4) AS var_qty
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // E11: graft's native expressions callable from TEXT SQL — the
    // SQL-gateway user runs the same fused codegen cosine as the
    // Column API. Oracle recomputes via DuckDB list functions.
    Q("q_sql_native_fn",
      (s, d) => {
        graft.functions.Vectors.registerSqlFunctions(s)
        GraftSession.sql(s, d,
          """SELECT a.vec_id AS va, b.vec_id AS vb,
            |round(cosine_sim(a.embedding, b.embedding), 4) AS cos
            |FROM embeddings a JOIN embeddings b
            |ON a.vec_id < 5 AND b.vec_id BETWEEN 5 AND 9
            |ORDER BY va, vb""".stripMargin)
      },
      Some("""SELECT a.vec_id AS va, b.vec_id AS vb,
             |round(list_inner_product(a.embedding, b.embedding) /
             |  (sqrt(list_inner_product(a.embedding, a.embedding)) *
             |   sqrt(list_inner_product(b.embedding, b.embedding))), 4) AS cos
             |FROM embeddings a JOIN embeddings b
             |ON a.vec_id < 5 AND b.vec_id BETWEEN 5 AND 9
             |ORDER BY va, vb""".stripMargin)),

    // E08: sketch quantiles (KLL/GK-style percentile_approx) — the
    // 100 TB path where exact percentile's full sort is infeasible.
    // Estimates are engine-specific → rows-only; the spec bounds the
    // error against the exact quantile.
    Q("q_approx_quantile",
      (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile_approx(o_totalprice, 0.5, 1000)"), 2).as("p50_approx"),
          round(expr("percentile_approx(o_totalprice, 0.95, 1000)"), 2).as("p95_approx"))
        .orderBy("o_orderpriority"),
      None),

    // Lambda higher-order functions over arrays — the expression
    // family (filter/aggregate/exists/transform) that keeps per-row
    // collection logic INSIDE codegen instead of exploding rows or
    // dropping to UDFs. The token array is materialized once at a
    // projection boundary (§6.5.1) and every lambda references the
    // attribute. DuckDB mirrors each with its list_* lambdas.
    Q("q_hof_surface",
      (s, d) => t(s, d, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"),
          size(expr("filter(ws, w -> length(w) > 4)")).cast("long").as("n_long"),
          expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").as("total_chars"),
          expr("exists(ws, w -> w = 'join')").as("has_join"),
          expr("array_max(transform(ws, w -> length(w)))").cast("long").as("max_len"))
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
             |SELECT doc_id,
             |  len(list_filter(ws, w -> len(w) > 4))::BIGINT AS n_long,
             |  list_sum(list_transform(ws, w -> len(w)))::BIGINT AS total_chars,
             |  len(list_filter(ws, w -> w = 'join')) > 0 AS has_join,
             |  list_max(list_transform(ws, w -> len(w)))::BIGINT AS max_len
             |FROM w ORDER BY doc_id""".stripMargin)),

    // Sketch-based heavy hitters (Spark 4 approx_top_k — DataSketches
    // frequent-items): the single-pass, mergeable way to find hot
    // tokens/keys at 100 TB, where an exact groupBy over a huge key
    // domain would shuffle the domain. Here the tracked-item budget
    // exceeds the vocabulary, so the sketch is EXACT and the oracle
    // gate can hash-compare against DuckDB's exact top-k; ordering is
    // re-derived deterministically (count desc, then token) because
    // the sketch's own tie order is unspecified.
    Q("q_approx_topk",
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(expr("approx_top_k(tok, 50, 1000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("token"), col("e.count").cast("long").as("cnt"))
        .orderBy(desc("cnt"), col("token"))
        .limit(10),
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |SELECT token, count(*)::BIGINT AS cnt FROM toks
             |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 10""".stripMargin)),

    // E18: MERGEABLE distinct-count sketches — the pre-aggregated
    // sketch-MV pattern every large-scale metrics stack runs on. A
    // per-(day, type) HLL sketch is built ONCE (map-side combinable,
    // fixed KB per group); the rollup then UNIONS sketches instead of
    // re-reading raw events — count-distinct over any date range in
    // O(groups), not O(events). HLL union at equal lgK is LOSSLESS
    // (same registers as sketching the union directly; the spec
    // asserts estimate equality with a direct one-level sketch), which
    // is exactly why approx_count_distinct alone is NOT enough: its
    // results can't be combined later without the raw data.
    Q("q_hll_rollup",
      (s, d) => t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
          count(lit(1)).as("days"))
        .orderBy("event_type"),
      None),

    // DECIMAL(15,2) money path — real warehouse workloads carry money
    // as exact decimals, not doubles. The whole chain (cast, subtract,
    // multiply with Spark's precision/scale promotion, sum, widen)
    // stays decimal: the results are EXACT — no float ordering
    // nudge anywhere, the thing the double-based corpus needs 1e-6
    // for. Compared as scale-preserving strings because the two
    // engines' clients render decimals differently (DuckDB's pandas
    // bridge degrades them to float64), not because the values differ.
    Q("q_agg_groupby_dec",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(15,2)").as("q"),
          col("l_extendedprice").cast("decimal(15,2)").as("p"),
          col("l_discount").cast("decimal(15,2)").as("disc"))
        .groupBy("l_returnflag")
        .agg(sum("q").cast("decimal(20,2)").cast("string").as("sum_qty"),
          sum(col("p") * (lit(1).cast("decimal(15,2)") - col("disc")))
            .cast("decimal(30,4)").cast("string").as("revenue"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |CAST(CAST(sum(CAST(l_quantity AS DECIMAL(15,2))) AS DECIMAL(20,2)) AS VARCHAR) AS sum_qty,
             |CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |  (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2)))) AS DECIMAL(30,4)) AS VARCHAR) AS revenue
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q3 over the decimal money path: same join/agg shape as
    // q_tpch_q3, revenue exact end-to-end; top-10 ordered on the
    // DECIMAL before the render cast, ties broken by key.
    Q("q_tpch_q3_dec",
      (s, d) => t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders").where(col("o_orderdate") < "1998-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").where(col("l_shipdate") > "1998-01-01"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(col("l_extendedprice").cast("decimal(15,2)") *
            (lit(1).cast("decimal(15,2)") - col("l_discount").cast("decimal(15,2)")))
          .cast("decimal(30,4)").as("rev_dec"))
        .orderBy(desc("rev_dec"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          col("rev_dec").cast("string").as("revenue")),
      Some("""WITH top AS (
             |  SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |    (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2)))) AS DECIMAL(30,4)) AS rev_dec
             |  FROM customer, orders, lineitem
             |  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
             |  AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |  GROUP BY 1, 2, 3
             |  ORDER BY rev_dec DESC, l_orderkey LIMIT 10)
             |SELECT l_orderkey, o_orderdate, o_orderpriority,
             |CAST(rev_dec AS VARCHAR) AS revenue FROM top
             |ORDER BY rev_dec DESC, l_orderkey""".stripMargin)),

    // A98: single-pass table profiling (the ANALYZE / data-quality
    // sweep every warehouse runs before trusting a table): per-column
    // row count, non-null count, exact distinct count — ONE scan
    // computing every column's metrics as one multi-aggregate row
    // (Spark plans multi-distinct via a single expand, not one scan
    // per column), then unpivoted to the (column, metrics) report.
    Q("q_profile",
      (s, d) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        val aggs = count(lit(1)).as("_rows") +: cols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}__nn"), count_distinct(col(c)).as(s"${c}__nd"))
        }
        val one = Tables(s, d, "orders").agg(aggs.head, aggs.tail: _*)
        val stacked = cols.map { c =>
          s"'$c', _rows, ${c}__nn, ${c}__nd"
        }.mkString(", ")
        one.selectExpr(
          s"stack(${cols.length}, $stacked) AS (column_name, n_rows, non_null, n_distinct)")
          .orderBy("column_name")
      },
      Some("""SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
             |  count(o_custkey) AS non_null, count(DISTINCT o_custkey) AS n_distinct FROM orders
             |UNION ALL SELECT 'o_orderkey', count(*), count(o_orderkey),
             |  count(DISTINCT o_orderkey) FROM orders
             |UNION ALL SELECT 'o_orderpriority', count(*), count(o_orderpriority),
             |  count(DISTINCT o_orderpriority) FROM orders
             |UNION ALL SELECT 'o_orderstatus', count(*), count(o_orderstatus),
             |  count(DISTINCT o_orderstatus) FROM orders
             |ORDER BY 1""".stripMargin)),
  )
}
