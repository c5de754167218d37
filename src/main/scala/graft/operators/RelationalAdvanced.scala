package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** A-block part 2: windows, multi-dim grouping, pivot, subqueries,
  * expression surface, flagship TPC-H shapes. Window partitions are
  * keyed on low-cardinality columns here; at 100 TB the same plans
  * hold because each window partition is independent (one shuffle on
  * the partition key, then per-partition sort — no global sort).
  */
object RelationalAdvanced {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Daily revenue rollup reused by the running/lag window queries. */
  private def daily(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(round(sum("l_extendedprice"), 2).as("rev"))

  private val dailySql =
    "SELECT CAST(l_shipdate AS DATE) AS day, round(sum(l_extendedprice),2) AS rev FROM lineitem GROUP BY 1"

  val qs: Seq[Q] = Seq(

    Q("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders").where(col("o_totalprice") > 450000)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"))
          .orderBy("o_orderpriority", "rnk", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
             |rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
             |dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk
             |FROM orders WHERE o_totalprice > 450000
             |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin)),

    Q("q_window_running",
      (s, d) => {
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
        daily(s, d)
          .select(col("day"), col("rev"),
            round(sum("rev").over(w), 2).as("cum_rev"),
            round(avg("rev").over(w7), 2).as("ma7"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS ($dailySql)
              |SELECT day, rev,
              |round(sum(rev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS cum_rev,
              |round(avg(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),2) AS ma7
              |FROM daily ORDER BY day""".stripMargin)),

    Q("q_window_lag",
      (s, d) => {
        val w = Window.orderBy("day")
        daily(s, d)
          .select(col("day"), col("rev"),
            round(col("rev") - lag("rev", 1).over(w), 2).as("delta"),
            round(lead("rev", 1).over(w) - col("rev"), 2).as("next_delta"))
          .orderBy("day")
      },
      Some(s"""WITH daily AS ($dailySql)
              |SELECT day, rev,
              |round(rev - lag(rev, 1) OVER (ORDER BY day),2) AS delta,
              |round(lead(rev, 1) OVER (ORDER BY day) - rev,2) AS next_delta
              |FROM daily ORDER BY day""".stripMargin)),

    Q("q_window_topk_group",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority").orderBy(desc("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"))
          .where(col("rn") <= 3)
          .orderBy("o_orderpriority", "rn")
      },
      Some("""SELECT * FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),

    Q("q_rollup",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .rollup(col("c_mktsegment"), col("o_orderstatus"))
        .agg(grouping(col("c_mktsegment")).as("gs"), grouping(col("o_orderstatus")).as("go"),
          count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
        .select(
          when(col("gs") === 1, "ALL").otherwise(col("c_mktsegment")).as("seg"),
          when(col("go") === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
          col("cnt"), col("rev"))
        .orderBy("seg", "status"),
      Some("""SELECT CASE WHEN grouping(c_mktsegment)=1 THEN 'ALL' ELSE c_mktsegment END AS seg,
             |CASE WHEN grouping(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
             |count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY ROLLUP (c_mktsegment, o_orderstatus) ORDER BY seg, status""".stripMargin)),

    Q("q_cube",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderstatus"))
        .agg(grouping(col("c_mktsegment")).as("gs"), grouping(col("o_orderstatus")).as("go"),
          count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
        .select(
          when(col("gs") === 1, "ALL").otherwise(col("c_mktsegment")).as("seg"),
          when(col("go") === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
          col("cnt"), col("rev"))
        .orderBy("seg", "status"),
      Some("""SELECT CASE WHEN grouping(c_mktsegment)=1 THEN 'ALL' ELSE c_mktsegment END AS seg,
             |CASE WHEN grouping(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
             |count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY CUBE (c_mktsegment, o_orderstatus) ORDER BY seg, status""".stripMargin)),

    Q("q_grouping_sets",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment"), col("o_orderstatus")), Seq(col("c_mktsegment")), Seq.empty),
          col("c_mktsegment"), col("o_orderstatus"))
        .agg(grouping(col("c_mktsegment")).as("gs"), grouping(col("o_orderstatus")).as("go"),
          count(lit(1)).as("cnt"))
        .select(
          when(col("gs") === 1, "ALL").otherwise(col("c_mktsegment")).as("seg"),
          when(col("go") === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
          col("cnt"))
        .orderBy("seg", "status"),
      Some("""SELECT CASE WHEN grouping(c_mktsegment)=1 THEN 'ALL' ELSE c_mktsegment END AS seg,
             |CASE WHEN grouping(o_orderstatus)=1 THEN 'ALL' ELSE o_orderstatus END AS status,
             |count(*) AS cnt
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (c_mktsegment), ())
             |ORDER BY seg, status""".stripMargin)),

    Q("q_pivot",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderstatus")
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |round(sum(CASE WHEN c_mktsegment='AUTOMOBILE' THEN o_totalprice END),2) AS "AUTOMOBILE",
             |round(sum(CASE WHEN c_mktsegment='BUILDING' THEN o_totalprice END),2) AS "BUILDING",
             |round(sum(CASE WHEN c_mktsegment='FURNITURE' THEN o_totalprice END),2) AS "FURNITURE",
             |round(sum(CASE WHEN c_mktsegment='HOUSEHOLD' THEN o_totalprice END),2) AS "HOUSEHOLD",
             |round(sum(CASE WHEN c_mktsegment='MACHINERY' THEN o_totalprice END),2) AS "MACHINERY"
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Scalar subquery: declared as a broadcast cross join of a 1-row
    // aggregate — no driver-side collect, works at any scale.
    Q("q_subquery_scalar",
      (s, d) => {
        val ord = t(s, d, "orders")
        val thr = ord.agg(avg("o_totalprice").as("thr"))
        ord.crossJoin(broadcast(thr))
          .where(col("o_totalprice") > col("thr"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("q_subquery_in",
      (s, d) => {
        val asiaNations = t(s, d, "nation")
          .join(broadcast(t(s, d, "region").where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        t(s, d, "customer")
          .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("bal"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS cnt, round(sum(c_acctbal),2) AS bal
             |FROM customer WHERE c_nationkey IN
             |(SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
             | WHERE r_name = 'ASIA')
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    Q("q_subquery_exists",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c WHERE EXISTS
             |(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_cte",
      (s, d) => {
        val hv = t(s, d, "orders").groupBy("o_custkey")
          .agg(sum("o_totalprice").as("s"))
        hv.where(col("s") > 1000000)
          .agg(lit("cnt_big").as("metric"), count(lit(1)).cast("double").as("v"))
          .union(hv.agg(lit("avg_spend").as("metric"), round(avg("s"), 2).as("v")))
          .orderBy("metric")
      },
      Some("""WITH hv AS (SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY 1)
             |SELECT * FROM (
             |SELECT 'cnt_big' AS metric, CAST(count(*) AS DOUBLE) AS v FROM hv WHERE s > 1000000
             |UNION ALL SELECT 'avg_spend', round(avg(s),2) FROM hv) ORDER BY metric""".stripMargin)),

    Q("q_having",
      (s, d) => t(s, d, "part").groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 80)
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
             |HAVING count(*) >= 80 ORDER BY p_brand""".stripMargin)),

    Q("q_case_expr",
      (s, d) => t(s, d, "orders")
        .select(when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("band"), col("o_totalprice"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("band"),
      Some("""SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
             |WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS band,
             |count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders GROUP BY 1 ORDER BY band""".stripMargin)),

    Q("q_expr_string",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        lower(col("p_type")).as("lt"),
        substring(col("p_name"), 1, 8).as("pfx"),
        length(col("p_name")).cast("long").as("len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("bt"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("rep"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("w1"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt,
             |substr(p_name, 1, 8) AS pfx, length(p_name) AS len,
             |concat(p_brand, ':', p_type) AS bt,
             |replace(p_name, ' ', '_') AS rep,
             |regexp_extract(p_name, '^(\w+)', 1) AS w1
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("q_expr_date",
      (s, d) => t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          date_trunc("month", col("o_orderdate")).cast("date").as("mstart"))
        .agg(count(lit(1)).as("cnt"),
          datediff(max(col("o_orderdate")), min(col("o_orderdate"))).cast("long").as("span_days"))
        .orderBy("yr", "mo"),
      Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             |CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
             |count(*) AS cnt,
             |date_diff('day', min(o_orderdate), max(o_orderdate)) AS span_days
             |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin)),

    Q("q_expr_math",
      (s, d) => t(s, d, "lineitem").where(col("l_linenumber") === 1).select(
        col("l_orderkey"),
        round(abs(col("l_extendedprice") - 1000), 2).as("a"),
        ceil(col("l_quantity")).as("c"),
        floor(col("l_quantity")).as("f"),
        round(sqrt(col("l_extendedprice")), 4).as("sq"),
        round(log(col("l_extendedprice")), 6).as("lg"),
        round(pow(col("l_discount") + 1, 2), 6).as("pw"),
        (col("l_orderkey") % 7).as("md"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, round(abs(l_extendedprice - 1000),2) AS a,
             |CAST(ceil(l_quantity) AS BIGINT) AS c, CAST(floor(l_quantity) AS BIGINT) AS f,
             |round(sqrt(l_extendedprice),4) AS sq, round(ln(l_extendedprice),6) AS lg,
             |round(pow(l_discount + 1, 2),6) AS pw, l_orderkey % 7 AS md
             |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin)),

    Q("q_expr_null",
      (s, d) => t(s, d, "lineitem").where(col("l_linenumber") === 1).select(
        col("l_orderkey"),
        round(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)), 2).as("disc_n"),
        col("l_discount") <=> lit(0.05)).toDF("l_orderkey", "disc_n", "eq5")
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |round(coalesce(nullif(l_discount, 0.0), -1.0),2) AS disc_n,
             |l_discount IS NOT DISTINCT FROM 0.05 AS eq5
             |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin)),

    Q("q_expr_cast",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).as("ip"),
        col("o_orderkey").cast("string").as("ks"),
        col("o_orderdate").cast("date").as("od"),
        col("o_orderkey").cast("string").cast("long").as("rt"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS ip,
             |CAST(o_orderkey AS VARCHAR) AS ks, CAST(o_orderdate AS DATE) AS od,
             |CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS rt
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q3 shape (no o_shippriority in the synthetic schema; we
    // carry o_orderpriority instead).
    Q("q_tpch_q3",
      (s, d) => t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders").where(col("o_orderdate") < "1998-01-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").where(col("l_shipdate") > "1998-01-01"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(RelationalCore.money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |round(sum(l_extendedprice*(1-l_discount)) + 0.000001,2) AS revenue
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
             |AND l_orderkey = o_orderkey
             |AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q10 shape: returned-item report.
    Q("q_tpch_q10",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders")
          .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01"),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").where(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(RelationalCore.money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          round(max("c_acctbal"), 2).as("acctbal"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name,
             |round(sum(l_extendedprice*(1-l_discount)) + 0.000001,2) AS revenue,
             |round(max(c_acctbal),2) AS acctbal
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
             |AND l_returnflag = 'R' AND c_nationkey = n_nationkey
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q4 shape (order-priority checking): a quarter of orders
    // semi-joined by EXISTS against late-shipping lines (the corpus
    // lacks commit/receipt dates; ship > order + 30 days stands in).
    // The EXISTS becomes one left-semi join on orderkey with the
    // lateness residual — no lineitem re-aggregation.
    Q("q_tpch_q4",
      (s, d) => {
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= "1995-07-01" && col("o_orderdate") < "1995-10-01")
        val l = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(l,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'
             |AND EXISTS (SELECT 1 FROM lineitem
             |            WHERE l_orderkey = o_orderkey
             |            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q18 shape (large-volume customers): HAVING-subquery over
    // the fact, then a 3-way join and global top-k. The per-order
    // quantity aggregate is computed ONCE (map-side partial) and
    // joined back — never a correlated per-row re-scan.
    Q("q_tpch_q18",
      (s, d) => {
        val big = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty")).where(col("total_qty") > 250)
        t(s, d, "customer").select("c_custkey", "c_name")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |       sum(l_quantity) AS total_qty
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |              JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1, 2, 3, 4, 5 HAVING sum(l_quantity) > 250
             |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // EXISTS + NOT EXISTS double correlation — another supplier was on
    // the order, and no OTHER supplier shipped late. Through text SQL
    // so Spark's subquery decorrelation does the planning; lateness is
    // ship > order + 80 days for this corpus.
    Q("q_tpch_q21",
      (s, d) => {
        t(s, d, "supplier").createOrReplaceTempView("supplier")
        t(s, d, "orders").createOrReplaceTempView("orders")
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT s_name, count(*) AS numwait
                |FROM supplier, lineitem l1, orders
                |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
                |AND l1.l_shipdate > o_orderdate + INTERVAL 80 DAYS
                |AND EXISTS (SELECT 1 FROM lineitem l2
                |            WHERE l2.l_orderkey = l1.l_orderkey
                |            AND l2.l_suppkey <> l1.l_suppkey)
                |AND NOT EXISTS (SELECT 1 FROM lineitem l3
                |                WHERE l3.l_orderkey = l1.l_orderkey
                |                AND l3.l_suppkey <> l1.l_suppkey
                |                AND l3.l_shipdate > o_orderdate + INTERVAL 80 DAYS)
                |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier, lineitem l1, orders
             |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             |AND l1.l_shipdate > o_orderdate + INTERVAL 80 DAY
             |AND EXISTS (SELECT 1 FROM lineitem l2
             |            WHERE l2.l_orderkey = l1.l_orderkey
             |            AND l2.l_suppkey <> l1.l_suppkey)
             |AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                WHERE l3.l_orderkey = l1.l_orderkey
             |                AND l3.l_suppkey <> l1.l_suppkey
             |                AND l3.l_shipdate > o_orderdate + INTERVAL 80 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // TPC-H Q7 shape (volume shipping between two nations): the
    // 6-way join keyed both ways through the nation dim — supplier's
    // nation AND customer's nation — with the symmetric pair filter
    // and per-year revenue. Both nation legs broadcast (fixed 25-row
    // dim); the fact joins shuffle on their own keys only.
    Q("q_tpch_q7",
      (s, d) => {
        val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey",
          "l_shipdate", "l_extendedprice", "l_discount")
        val pairs = (col("supp_nat") === 1 && col("cust_nat") === 2) ||
          (col("supp_nat") === 2 && col("cust_nat") === 1)
        t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey").as("supp_nat"))
          .join(li, col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey").as("cust_nat")),
            col("o_custkey") === col("c_custkey"))
          .where(pairs)
          .groupBy(col("supp_nat"), col("cust_nat"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(RelationalCore.money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy("supp_nat", "cust_nat", "l_year")
      },
      Some("""SELECT s_nationkey AS supp_nat, c_nationkey AS cust_nat,
             |year(l_shipdate)::BIGINT AS l_year,
             |round(sum(l_extendedprice*(1-l_discount)) + 0.000001, 2) AS revenue
             |FROM supplier, lineitem, orders, customer
             |WHERE s_suppkey = l_suppkey AND l_orderkey = o_orderkey
             |AND o_custkey = c_custkey
             |AND ((s_nationkey = 1 AND c_nationkey = 2)
             |  OR (s_nationkey = 2 AND c_nationkey = 1))
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q12 shape (shipping-mode priority split): late lines
    // bucketed by returnflag with conditional priority counts — the
    // corpus has no shipmode/receiptdate, so returnflag and
    // ship > order + 60 days stand in; the CASE-count shape is Q12's.
    Q("q_tpch_q12",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
          .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag"),
            col("o_orderkey") === col("l_orderkey"))
          .where(col("l_returnflag").isin("A", "N") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             |sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag IN ('A','N')
             |AND l_shipdate > o_orderdate + INTERVAL 60 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q14 shape (promotion effect): the conditional-revenue
    // ratio — one global row, both sums in a single pass over the
    // month's lines joined to part.
    Q("q_tpch_q14",
      (s, d) => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        t(s, d, "lineitem")
          .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-03-01")
          .join(t(s, d, "part").select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
            sum(rev) + lit(1e-9), 4).as("promo_revenue"))
      },
      Some("""SELECT round(100.0 *
             |sum(CASE WHEN p_type = 'PROMO'
             |    THEN l_extendedprice*(1-l_discount) ELSE 0 END) /
             |sum(l_extendedprice*(1-l_discount)) + 1e-9, 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'""".stripMargin)),

    // TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three
    // brand/size/quantity envelopes OR-ed — the pushdown stress case;
    // the disjunction stays a single scan-side predicate, never three
    // scans unioned.
    Q("q_tpch_q19",
      (s, d) => {
        val cond =
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50))
        t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(t(s, d, "part").select("p_partkey", "p_brand", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .where(cond)
          .agg(RelationalCore.money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT round(sum(l_extendedprice*(1-l_discount)) + 0.000001, 2) AS revenue,
             |count(*) AS n_lines
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 1 AND 20)
             |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30
             |       AND l_quantity BETWEEN 10 AND 40)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
             |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin)),

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`, both linear interpolation).
    Q("q_quantile",
      (s, d) => t(s, d, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 2).as("p95"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5),2) AS p50,
             |round(quantile_cont(o_totalprice, 0.95),2) AS p95
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Spark side parses real JSON; the oracle matches it with a
    // regexp over the same single-key payloads.
    Q("q_json_extract",
      (s, d) => t(s, d, "events").where(col("event_type") === "purchase")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
             |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // TPC-H Q8 shape (national market share): the two-role revenue
    // ratio — per order-year, supplier-nation 3's share of all PROMO
    // revenue sold into region 1. Six-way star join where nation
    // appears on the CUSTOMER side for scoping and the SUPPLIER side
    // for the share split; the 1e-9 nudge keeps the 4-decimal round
    // off the half boundary (same device as Q14).
    Q("q_tpch_q8",
      (s, d) => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(t(s, d, "part").select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .where(col("p_type") === "PROMO")
          .join(t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey").as("supp_nat")),
            col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .where(col("n_regionkey") === 1)
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(
            sum(when(col("supp_nat") === 3, rev).otherwise(0.0)) / sum(rev) +
              lit(1e-9), 4).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT year(o_orderdate)::BIGINT AS o_year,
             |round(sum(CASE WHEN s_nationkey = 3
             |          THEN l_extendedprice*(1-l_discount) ELSE 0 END) /
             |      sum(l_extendedprice*(1-l_discount)) + 1e-9, 4) AS mkt_share
             |FROM lineitem, part, supplier, orders, customer, nation
             |WHERE l_partkey = p_partkey AND p_type = 'PROMO'
             |AND l_suppkey = s_suppkey AND l_orderkey = o_orderkey
             |AND o_custkey = c_custkey AND c_nationkey = n_nationkey
             |AND n_regionkey = 1
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q13 shape (customer order-count distribution): the filter
    // lives in the OUTER JOIN condition (customers with zero
    // qualifying orders must survive with count 0), then a second
    // aggregation histograms the counts — the classic
    // aggregate-of-aggregate. All-integer output, no float risk.
    Q("q_tpch_q13",
      (s, d) => {
        val qualifying = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderpriority")
          .where(col("o_orderpriority") =!= "1-URGENT")
        t(s, d, "customer").select("c_custkey")
          .join(qualifying, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""SELECT c_count, count(*)::BIGINT AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY 1 ORDER BY 2 DESC, 1 DESC""".stripMargin)),

    // TPC-H Q15 shape (top supplier): quarterly revenue rollup, max
    // revenue as a scalar, suppliers AT the max joined back. The max
    // compares ROUNDED revenues (money nudge on both engines), so the
    // winning set is stable cross-engine even on near-ties.
    Q("q_tpch_q15",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(RelationalCore.money(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_revenue"))
        t(s, d, "supplier").select("s_suppkey", "s_name")
          .join(rev, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(rev.agg(max("total_revenue").as("m"))),
            col("total_revenue") === col("m"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey AS supplier_no,
             |    round(sum(l_extendedprice*(1-l_discount)) + 0.000001, 2) AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name, total_revenue
             |FROM supplier JOIN revenue ON s_suppkey = supplier_no
             |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    // counts per part group with an excluded-supplier NOT IN subquery
    // (negative-balance suppliers stand in for the 'complaints'
    // comment filter the corpus lacks) — anti join + count(distinct).
    Q("q_tpch_q16",
      (s, d) => {
        val excluded = t(s, d, "supplier")
          .where(col("s_acctbal") < 0).select("s_suppkey")
        t(s, d, "lineitem").select("l_partkey", "l_suppkey")
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(t(s, d, "part").select("p_partkey", "p_brand", "p_type", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .where(col("p_brand") =!= "Brand#13" &&
            col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#13' AND p_size IN (1,4,7,10,13,16,19,22)
             |AND l_suppkey NOT IN
             |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1, 2, 3""".stripMargin)),

    // TPC-H Q17 shape (small-quantity revenue): lines below 20% of
    // their part's average quantity. `l_quantity < 0.2 * avg` is
    // restated exactly as `l_quantity * 5 * cnt < qsum` — quantities
    // are integer-valued, so both sides are exact in double and the
    // boundary cannot flip between engines (0.2*avg cannot be
    // represented exactly in binary).
    Q("q_tpch_q17",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice")
        val stats = li.groupBy(col("l_partkey").as("ap"))
          .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qsum"))
        li.join(t(s, d, "part").select("p_partkey", "p_brand"),
            col("l_partkey") === col("p_partkey"))
          .where(col("p_brand") === "Brand#9")
          .join(stats, col("l_partkey") === col("ap"))
          .where(col("l_quantity") * 5 * col("cnt") < col("qsum"))
          .agg(round(sum("l_extendedprice") / 7.0 + lit(1e-6), 2).as("avg_yearly"))
      },
      Some("""WITH stats AS (
             |  SELECT l_partkey AS ap, count(*) AS cnt, sum(l_quantity) AS qsum
             |  FROM lineitem GROUP BY 1)
             |SELECT round(sum(l_extendedprice) / 7.0 + 0.000001, 2) AS avg_yearly
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |JOIN stats ON l_partkey = ap
             |WHERE p_brand = 'Brand#9' AND l_quantity * 5 * cnt < qsum""".stripMargin)),

    // TPC-H Q22 shape (global sales opportunity): above-average-
    // balance customers with NO orders, grouped by a "country code"
    // (the last-two-digits substring of c_name stands in for the
    // phone prefix the corpus lacks) — scalar avg subquery + anti
    // join + IN-list.
    Q("q_tpch_q22",
      (s, d) => {
        val cust = t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
          .withColumn("cntrycode", substring(col("c_name"), 17, 2))
          .where(col("cntrycode").isin("01", "13", "25", "31", "42"))
        val bal = cust.where(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("ab"))
        cust.join(broadcast(bal))
          .where(col("c_acctbal") > col("ab"))
          .join(t(s, d, "orders").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("cntrycode")
          .agg(count(lit(1)).as("numcust"),
            RelationalCore.money(sum("c_acctbal")).as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, c_acctbal, substring(c_name, 17, 2) AS cntrycode
             |  FROM customer
             |  WHERE substring(c_name, 17, 2) IN ('01','13','25','31','42'))
             |SELECT cntrycode, count(*)::BIGINT AS numcust,
             |round(sum(c_acctbal) + 0.000001, 2) AS totacctbal
             |FROM cust
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust WHERE c_acctbal > 0)
             |AND c_custkey NOT IN (SELECT o_custkey FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q2 shape (minimum-cost supplier): the correlated-min-
    // over-a-join pattern. The corpus has no partsupp, so the supply
    // cost is DERIVED: min unit price ever charged per (part,
    // supplier) pair in lineitem; the winner per part is the supplier
    // AT the per-part minimum. Cost equality compares doubles both
    // engines computed from identical inputs with identical
    // expressions, so the winning set is stable.
    Q("q_tpch_q2",
      (s, d) => {
        val ps = t(s, d, "lineitem")
          .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
        val best = ps.groupBy(col("pk").as("bpk")).agg(min("cost").as("mc"))
        ps.join(best, col("pk") === col("bpk") && col("cost") === col("mc"))
          .join(t(s, d, "part").select("p_partkey", "p_brand", "p_size"),
            col("pk") === col("p_partkey"))
          .where(col("p_size") === 5)
          .join(t(s, d, "supplier").select("s_suppkey", "s_name", "s_acctbal"),
            col("sk") === col("s_suppkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"),
            round(col("cost") + lit(1e-9), 2).as("min_cost"))
          .orderBy("p_partkey", "s_name")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS pk, l_suppkey AS sk,
             |    min(l_extendedprice / l_quantity) AS cost
             |  FROM lineitem GROUP BY 1, 2),
             |best AS (SELECT pk, min(cost) AS mc FROM ps GROUP BY 1)
             |SELECT p_partkey, p_brand, s_name, round(cost + 1e-9, 2) AS min_cost
             |FROM ps JOIN best ON ps.pk = best.pk AND ps.cost = best.mc
             |JOIN part ON ps.pk = p_partkey AND p_size = 5
             |JOIN supplier ON ps.sk = s_suppkey
             |ORDER BY p_partkey, s_name""".stripMargin)),

    // TPC-H Q6 (forecasting revenue change): the pure filtered
    // aggregate — one scan, every predicate pushed, no join, no
    // shuffle beyond the single partial→final agg.
    Q("q_tpch_q6",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(RelationalCore.money(
          sum(col("l_extendedprice") * col("l_discount"))).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount) + 0.000001, 2) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q9 shape (product-type profit): 5-way join, LIKE filter
    // on part name, profit per (supplier nation, order year). The
    // corpus lacks ps_supplycost, so cost is modeled as 60% of the
    // part's retail price per unit — deterministic and engine-neutral.
    Q("q_tpch_q9",
      (s, d) => {
        val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")
        t(s, d, "lineitem")
          .join(t(s, d, "part").select("p_partkey", "p_name", "p_retailprice"),
            col("l_partkey") === col("p_partkey"))
          .where(col("p_name").like("small%"))
          .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(RelationalCore.money(sum(profit)).as("sum_profit"))
          .orderBy(col("nation"), desc("o_year"))
      },
      Some("""SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
             |round(sum(l_extendedprice*(1-l_discount)
             |          - 0.6*p_retailprice*l_quantity) + 0.000001, 2) AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin)),

    // TPC-H Q11 shape (important stock): per-part value with a
    // GLOBAL-scalar HAVING threshold (value > fraction of the total) —
    // the aggregate-vs-aggregate-of-itself pattern. Value = shipped
    // price volume by nation-0 suppliers, threshold 0.2% of its total.
    Q("q_tpch_q11",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .where(col("s_nationkey") === 0)
          .select(col("l_partkey"), (col("l_extendedprice") * col("l_quantity")).as("val"))
        val perPart = li.groupBy("l_partkey").agg(sum("val").as("value"))
        val total = li.agg((sum("val") * 0.002).as("threshold"))
        perPart.crossJoin(broadcast(total))
          .where(col("value") > col("threshold"))
          .select(col("l_partkey").as("ps_partkey"),
            RelationalCore.money(col("value")).as("value"))
          .orderBy(desc("value"), col("ps_partkey"))
      },
      Some("""WITH v AS (
             |  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE s_nationkey = 0 GROUP BY 1)
             |SELECT l_partkey AS ps_partkey,
             |  round(value + 0.000001, 2) AS value
             |FROM v
             |WHERE value > (SELECT sum(value) * 0.002 FROM v)
             |ORDER BY 2 DESC, 1""".stripMargin)),

    // TPC-H Q20 shape (potential part promotion): nested IN
    // subqueries with a grouped threshold — suppliers who shipped
    // more than 80 units of 'small' parts in 1997. The inner part
    // filter and the grouped quantity threshold mirror Q20's
    // partsupp/availqty logic over the columns the corpus has.
    Q("q_tpch_q20",
      (s, d) => {
        val smallParts = t(s, d, "part")
          .where(col("p_name").like("small%")).select("p_partkey")
        val bigShippers = t(s, d, "lineitem")
          .where(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
          .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_suppkey")
          .agg(sum("l_quantity").as("qty"))
          .where(col("qty") > 80)
          .select("l_suppkey")
        t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
          .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .where(col("s_nationkey") < 10)
          .select("s_name", "s_nationkey")
          .orderBy("s_name")
      },
      Some("""SELECT s_name, s_nationkey FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem
             |  WHERE l_partkey IN
             |    (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
             |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |  GROUP BY 1 HAVING sum(l_quantity) > 80)
             |AND s_nationkey < 10
             |ORDER BY s_name""".stripMargin)),

    // TPC-H Q1 (pricing summary report): the canonical wide-aggregate
    // scan — one pass over lineitem, every predicate pushed to the
    // scan, partial→final agg on a 6-value grouping key. At 100 TB
    // this is the map-side-combine showcase: the shuffle carries six
    // rows per task regardless of input size.
    Q("q_tpch_q1",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") <= "1998-04-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          RelationalCore.money(sum("l_quantity")).as("sum_qty"),
          RelationalCore.money(sum("l_extendedprice")).as("sum_base_price"),
          RelationalCore.money(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          RelationalCore.money(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax")))).as("sum_charge"),
          RelationalCore.money(avg("l_quantity")).as("avg_qty"),
          RelationalCore.money(avg("l_extendedprice")).as("avg_price"),
          round(avg("l_discount") + lit(1e-6), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity) + 0.000001, 2) AS sum_qty,
             |round(sum(l_extendedprice) + 0.000001, 2) AS sum_base_price,
             |round(sum(l_extendedprice*(1-l_discount)) + 0.000001, 2) AS sum_disc_price,
             |round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)) + 0.000001, 2) AS sum_charge,
             |round(avg(l_quantity) + 0.000001, 2) AS avg_qty,
             |round(avg(l_extendedprice) + 0.000001, 2) AS avg_price,
             |round(avg(l_discount) + 0.000001, 4) AS avg_disc,
             |count(*)::BIGINT AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-04-01 00:00:00'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TPC-H Q5 (local supplier volume): the 6-way star join with the
    // customer-nation = supplier-nation co-location predicate. Region
    // and nation broadcast; customer⋈orders and lineitem⋈supplier
    // shuffle on their keys; the c_nationkey = s_nationkey equality
    // rides along as a post-join filter exactly as the spec demands.
    Q("q_tpch_q5",
      (s, d) => {
        val asiaNations = broadcast(
          t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
            .join(broadcast(t(s, d, "region").where(col("r_name") === "ASIA")
              .select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name"))
        t(s, d, "customer").select("c_custkey", "c_nationkey")
          .join(t(s, d, "orders")
            .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
            .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, d, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
            col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(RelationalCore.money(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)) + 0.000001, 2) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |AND r_name = 'ASIA'
             |AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin)),
  )
}
