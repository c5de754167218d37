package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LakeTable

/** Plan-shape assertions: the properties that make queries survive a
  * 100× scale-up — pushdown, pruning, broadcast, bucketing — hold in
  * the actual physical plans, not just in intent.
  */
class PlanSpec extends AnyFunSuite {
  import SharedSpark.{sf, spark}

  private def planOf(name: String): String =
    Registry.byName(name).run(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_project prunes to exactly the two selected columns") {
    val p = planOf("q_scan_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), p)
  }

  test("q_filter_pushdown reaches the parquet scan") {
    val p = planOf("q_filter_pushdown")
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q_join_broadcast uses a broadcast hash join") {
    assert(planOf("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_multi broadcasts every dim (single fact-fact shuffle join)") {
    val p = planOf("q_join_multi")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size <= 1, p)
  }

  test("LakeTable partitioned read prunes partitions at the scan") {
    val lake = s"${operators.Lakehouse.scratch}/spec_part"
    LakeTable.create(spark, lake,
      Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderpriority"),
      partitionBy = Seq("o_orderpriority"))
    val df = LakeTable.read(spark, lake).where(col("o_orderpriority") === "1-URGENT")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters:") && scan.contains("o_orderpriority"), scan)
    // Pruned scan must read strictly fewer files than the table holds.
    val pruned = df.select(input_file_name()).distinct().count()
    val all = LakeTable.read(spark, lake).select(input_file_name()).distinct().count()
    assert(pruned < all, s"pruned=$pruned all=$all")
  }

  test("bucketed tables join without any exchange") {
    Registry.byName("q_bucketed_join").run(spark, sf).collect() // creates the tables
    val joined = spark.table("g_lineitem_buck").hint("merge")
      .join(spark.table("g_orders_buck").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed join should not shuffle:\n$p")
  }

  test("salted skew agg produces two-phase aggregation without a hot single key") {
    val p = planOf("q_skew_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // partial+final × two phases
  }
}
