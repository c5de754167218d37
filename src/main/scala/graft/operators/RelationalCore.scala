package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** A-block part 1: scan/filter/aggregate/join/set-op surface — the
  * core of what a Kyuubi (Spark SQL) user of the reference platform
  * runs (reference: internal/controller/kyuubi.go deploys the SQL
  * gateway; this library IS the engine those queries run on).
  *
  * Scale notes: fixed-cardinality dims (region: 5 rows, nation: 25)
  * carry explicit broadcast() hints — safe at any SF. SF-scaled dims
  * (customer/supplier/part) deliberately carry NO hint: the
  * size-based planner broadcasts them while they fit and AQE decides
  * at runtime otherwise; a hard hint would OOM a 100 TB run.
  * Fact-fact joins shuffle once on the join key; all aggregates are
  * algebraic (map-side partial agg for free).
  */
object RelationalCore {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Rounds a summed price-product to cents. The true sums are exact
    * 4-decimal values (2dp price × 2dp factor), which land exactly on
    * the .xx50 half-up boundary; summation-order FP noise would then
    * flip the last cent between engines/runs. The +1e-6 nudge (applied
    * identically in the DuckDB oracles) makes the boundary decision
    * deterministic.
    */
  private[operators] def money(c: Column): Column = round(c + lit(1e-6), 2)

  val qs: Seq[Q] = Seq(

    Q("q_scan_project",
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey")),

    Q("q_filter_pushdown",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_returnflag") === "R" && col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // sum_price accumulates EXACT decimal then renders double: a
    // double sum at ~3×10¹¹ flips the last cent with partition order
    // (caught by the sf1 gate — Spark's 32 partial sums vs DuckDB's
    // sequential fold disagreed by 0.01). 2-decimal money inputs sum
    // exactly in DECIMAL(15,2), so no rounding is even needed.
    Q("q_agg_global",
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(15,2)")).cast("double").as("sum_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price")),
      Some("""SELECT count(*) AS cnt,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price,
             |round(avg(l_quantity),4) AS avg_qty, round(min(l_extendedprice),2) AS min_price,
             |round(max(l_extendedprice),2) AS max_price FROM lineitem""".stripMargin)),

    // TPC-H Q1 pricing summary.
    // Money sums accumulate EXACT decimal then render double (the
    // sf1-gate lesson, see q_agg_global): 2-decimal inputs make the
    // products 4/6-decimal, all exact in DECIMAL; the one round per
    // group happens on the exact sum, so no engine/order can flip a
    // cent and the +1e-6 nudge becomes unnecessary on these columns.
    Q("q_agg_groupby",
      (s, d) => {
        val p = col("l_extendedprice").cast("decimal(15,2)")
        val disc = lit(1).cast("decimal(15,2)") - col("l_discount").cast("decimal(15,2)")
        val tax = lit(1).cast("decimal(15,2)") + col("l_tax").cast("decimal(15,2)")
        t(s, d, "lineitem")
          .where(col("l_shipdate") <= "1998-09-02")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            sum(p).cast("double").as("sum_base_price"),
            round(sum(p * disc), 2).cast("double").as("sum_disc_price"),
            round(sum((p * disc).cast("decimal(25,4)") * tax), 2).cast("double").as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity),2) AS sum_qty,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
             |CAST(round(sum(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |  (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2)))),2) AS DOUBLE) AS sum_disc_price,
             |CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) *
             |  (CAST(1 AS DECIMAL(15,2)) - CAST(l_discount AS DECIMAL(15,2))) AS DECIMAL(25,4)) *
             |  (CAST(1 AS DECIMAL(15,2)) + CAST(l_tax AS DECIMAL(15,2)))),2) AS DOUBLE) AS sum_charge,
             |round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price,
             |round(avg(l_discount),6) AS avg_disc, count(*) AS cnt
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q_agg_distinct",
      (s, d) => t(s, d, "lineitem").agg(
        countDistinct(col("l_partkey")).as("d_part"),
        countDistinct(col("l_suppkey")).as("d_supp"),
        count(lit(1)).as("cnt")),
      Some("""SELECT count(DISTINCT l_partkey) AS d_part, count(DISTINCT l_suppkey) AS d_supp,
             |count(*) AS cnt FROM lineitem""".stripMargin)),

    Q("q_agg_stats",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2).as("cov_pq"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(stddev_samp(l_quantity),4) AS sd_qty,
             |round(var_samp(l_quantity),4) AS var_qty,
             |round(corr(l_extendedprice, l_quantity),6) AS corr_pq,
             |round(covar_samp(l_extendedprice, l_quantity),2) AS cov_pq
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q_join_inner",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS cnt, round(sum(o_totalprice),2) AS rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    Q("q_join_left",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("rev"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |round(coalesce(sum(o_totalprice),0),2) AS rev
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("q_join_right",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_nationkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, count(o_orderkey) AS n_orders
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    Q("q_join_full",
      (s, d) => {
        val cn = t(s, d, "customer").where(col("c_custkey") < 500)
          .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
        val sn = t(s, d, "supplier").where(col("s_suppkey") < 50)
          .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
        cn.join(sn, col("cnk") === col("snk"), "full")
          .select(
            coalesce(col("cnk"), col("snk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT coalesce(cnk, snk) AS nationkey, coalesce(n_cust,0) AS n_cust,
             |coalesce(n_supp,0) AS n_supp FROM
             |(SELECT c_nationkey AS cnk, count(*) AS n_cust FROM customer WHERE c_custkey < 500 GROUP BY 1) a
             |FULL JOIN
             |(SELECT s_nationkey AS snk, count(*) AS n_supp FROM supplier WHERE s_suppkey < 50 GROUP BY 1) b
             |ON cnk = snk ORDER BY nationkey""".stripMargin)),

    Q("q_join_semi",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer c WHERE EXISTS
             |(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_join_anti",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer c WHERE NOT EXISTS
             |(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q_join_cross",
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    Q("q_join_broadcast",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").where(col("p_size") <= 5)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS cnt, round(sum(l_quantity),2) AS qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size <= 5 GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // TPC-H Q5 shape: 6-table star join. All dims broadcast; the only
    // shuffles are lineitem⋈orders on orderkey and the final tiny agg.
    Q("q_join_multi",
      (s, d) => {
        val cust = t(s, d, "customer"); val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation"); val reg = t(s, d, "region")
        ord.where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(money(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)) + 0.000001,2) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |AND r_name = 'ASIA'
             |AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    Q("q_sort_limit",
      (s, d) => t(s, d, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    Q("q_distinct",
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q_union_all",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("id"), lit("cust").as("src"))
        .union(t(s, d, "supplier").select(col("s_suppkey").as("id"), lit("supp").as("src")))
        .orderBy("id", "src"),
      Some("""SELECT * FROM (SELECT c_custkey AS id, 'cust' AS src FROM customer
             |UNION ALL SELECT s_suppkey, 'supp' FROM supplier) ORDER BY id, src""".stripMargin)),

    Q("q_union",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer UNION
             |SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    Q("q_intersect",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer INTERSECT
             |SELECT o_custkey FROM orders ORDER BY k""".stripMargin)),

    Q("q_except",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_custkey AS k FROM customer EXCEPT
             |SELECT o_custkey FROM orders ORDER BY k""".stripMargin)),
  )
}
