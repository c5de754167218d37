package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** E-block join operators Spark lacks as built-ins, composed from
  * relational primitives so Catalyst still optimizes them.
  */
object CustomJoins {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** As-of join via the union-merge pattern: tag both sides, sort each
    * key partition by (time, tag), carry the last order forward. One
    * shuffle on the key — never the |left|×|right| blowup of the naive
    * "join then rank" plan, which is what the oracle spells.
    */
  def asofEventsOrders(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(
      col("user_id").as("uid"), col("ts").as("t"),
      col("event_id"), lit(1).as("tag"))
    val ord = t(s, d, "orders").select(
      col("o_custkey").as("uid"), col("o_orderdate").as("t"),
      col("o_orderkey"), lit(0).as("tag"))
    val merged = ev.withColumn("o_orderkey", lit(null).cast("long"))
      .select("uid", "t", "event_id", "tag", "o_orderkey")
      .union(ord.withColumn("event_id", lit(null).cast("long"))
        .select("uid", "t", "event_id", "tag", "o_orderkey"))
    val w = Window.partitionBy("uid")
      .orderBy(col("t"), col("tag"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("m", last(when(col("tag") === 0,
        struct(col("t").as("ot"), col("o_orderkey").as("ok"))), ignoreNulls = true).over(w))
      .where(col("tag") === 1 && col("m").isNotNull)
      .select(col("event_id"), col("uid").as("user_id"),
        col("m.ok").as("o_orderkey"), col("m.ot").as("o_orderdate"))
      .orderBy("event_id")
  }

  val qs: Seq[Q] = Seq(

    Q("q_asof_join",
      (s, d) => asofEventsOrders(s, d),
      Some("""WITH cand AS (
             |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             |    row_number() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
             |SELECT event_id, user_id, o_orderkey, o_orderdate
             |FROM cand WHERE rn = 1 ORDER BY event_id""".stripMargin)),

    // Range join rewritten as an equi-join: points bucket to
    // floor(value/width), bands cover exactly one bucket each, so the
    // theta-join (BNL at scale) becomes a broadcast hash join.
    Q("q_range_join",
      (s, d) => {
        val bands = s.range(0, 20).select(
          col("id").as("band_id"),
          (col("id") * 25.0).as("lo"),
          ((col("id") + 1) * 25.0).as("hi"))
        t(s, d, "events")
          .withColumn("bucket", floor(col("value") / 25.0))
          .join(broadcast(bands), col("bucket") === col("band_id") &&
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("band_id")
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
          .orderBy("band_id")
      },
      Some("""WITH bands AS (SELECT i AS band_id, i*25.0 AS lo, (i+1)*25.0 AS hi
             |               FROM range(0, 20) t(i))
             |SELECT band_id, count(*) AS cnt, round(sum(value),2) AS sum_val
             |FROM events JOIN bands ON value >= lo AND value < hi
             |GROUP BY band_id ORDER BY band_id""".stripMargin)),

    // HyperLogLog++ sketch distinct (rows-only: sketch estimates are
    // engine-specific; the spec asserts <5% error vs exact).
    Q("q_approx_distinct",
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type"),
      None),
  )
}
