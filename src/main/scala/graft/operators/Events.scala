package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** C-block batch equivalents of the stream pipelines (the reference's
  * `stream` NineClusterType, api/v1alpha1/ninecluster_types.go:41) plus
  * the skew-safe aggregation pattern. The same windowing expressions
  * are reused verbatim by graft.streaming.EventPipeline on a
  * readStream source — Structured Streaming executes the identical
  * logical plan incrementally with watermarks.
  */
object Events {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Epoch seconds regardless of timestamp flavor: TIMESTAMP_NTZ cannot
    * cast to DOUBLE directly, so route through LTZ — wall-clock lossless
    * under the session's fixed UTC timezone.
    */
  private def epochS(c: org.apache.spark.sql.Column) =
    c.cast("timestamp_ltz").cast("double")

  val qs: Seq[Q] = Seq(

    Q("q_events_tumbling",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
        .select(col("window.start").as("wstart"), col("event_type"), col("cnt"), col("sum_val"))
        .orderBy("wstart", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS wstart, event_type,
             |count(*) AS cnt, round(sum(value),2) AS sum_val
             |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin)),

    Q("q_events_sliding",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_val"))
        .select(col("window.start").as("wstart"), col("cnt"), col("sum_val"))
        .orderBy("wstart"),
      Some("""WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b0, value FROM events),
             |w AS (SELECT b0 AS wstart, value FROM b
             |      UNION ALL SELECT b0 - INTERVAL '30 minutes', value FROM b)
             |SELECT wstart, count(*) AS cnt, round(sum(value),2) AS sum_val
             |FROM w GROUP BY 1 ORDER BY wstart""".stripMargin)),

    // Session windows (30-minute inactivity gap) via Spark's native
    // session_window; oracle reproduces the islands with a
    // lag/cumulative-flag construction.
    Q("q_events_session",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_val"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sum_val"))
        .orderBy("user_id", "session_start"),
      Some("""WITH x AS (SELECT user_id, ts, value,
             |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
             |       THEN 1 ELSE 0 END AS new_s FROM events),
             |y AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM x)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             |round(sum(value),2) AS sum_val
             |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // Per-event session index assignment (gaps-and-islands as a
    // window computation — one shuffle on user_id, no state blowup).
    // event_id tiebreaks equal timestamps so lag/cumsum assignment is
    // deterministic across engines.
    Q("q_sessionize_custom",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("new_s",
            when(lag("ts", 1).over(byUser).isNull ||
              epochS(col("ts")) - epochS(lag("ts", 1).over(byUser)) >= 1800.0, 1L)
              .otherwise(0L))
          .withColumn("sid", sum("new_s").over(cum))
          .select("event_id", "user_id", "sid")
          .orderBy("event_id")
      },
      Some("""WITH x AS (SELECT event_id, user_id, ts,
             |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes'
             |       THEN 1 ELSE 0 END AS new_s FROM events)
             |SELECT event_id, user_id, (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sid
             |FROM x ORDER BY event_id""".stripMargin)),

    // Salted two-phase aggregation: partial agg on (key, salt) spreads
    // a hot key over 16 reducers, then the tiny per-key combine. Same
    // result as a plain groupBy; at 100 TB the salt bounds any single
    // reducer's input.
    Q("q_skew_agg",
      (s, d) => t(s, d, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("c"), sum("value").as("sv"))
        .groupBy("user_id")
        .agg(sum("c").as("cnt"), round(sum("sv"), 2).as("sum_val"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS cnt, round(sum(value),2) AS sum_val
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // E17: salted REPLICATE join — the skew mitigation for cases
    // AQE's skew-split cannot handle (a streamed build side, or join
    // shapes it won't divide). The big side salts each row
    // DETERMINISTICALLY into one of 8 buckets; the other side
    // replicates ×8 via a generator, so a hot key's rows land on 8
    // reducers instead of one. Same result set as the plain join
    // (the oracle), 8× the small side's shuffle volume as the price —
    // the standard trade when one key holds 30% of a 100 TB fact.
    Q("q_skew_join",
      (s, d) => {
        val salts = 8
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .withColumn("salt",
            pmod(xxhash64(col("l_linenumber"), col("l_orderkey")), lit(salts)).cast("int"))
        val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
          .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
        li.join(ord,
            li("l_orderkey") === ord("o_orderkey") && li("salt") === ord("salt"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"),
            round(sum("l_extendedprice") + lit(1e-6), 2).as("rev"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |round(sum(l_extendedprice) + 1e-6, 2) AS rev
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered-step funnel (view → click → purchase): the staple
    // behavioral-analytics query an OLAP tier serves. Each stage is a
    // per-user min(ts) AFTER the previous stage's time — three small
    // aggregates all partitioned by user_id, so the shuffle
    // partitioning from stage 1 is reused by the stage-2/3 joins
    // (one logical exchange, not three), and per-stage state is one
    // timestamp per user regardless of event volume.
    Q("q_funnel",
      (s, d) => {
        val e = t(s, d, "events").select("user_id", "event_type", "ts")
        val s1 = e.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val s2 = e.where(col("event_type") === "click").join(s1, "user_id")
          .where(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val s3 = e.where(col("event_type") === "purchase").join(s2, "user_id")
          .where(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        s1.agg(count(lit(1)).as("step_view"))
          .crossJoin(s2.agg(count(lit(1)).as("step_click")))
          .crossJoin(s3.agg(count(lit(1)).as("step_purchase")))
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |            WHERE event_type='view' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING(user_id)
             |       WHERE event_type='click' AND ts > t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING(user_id)
             |       WHERE event_type='purchase' AND ts > t2 GROUP BY 1)
             |SELECT (SELECT count(*) FROM s1) AS step_view,
             |       (SELECT count(*) FROM s2) AS step_click,
             |       (SELECT count(*) FROM s3) AS step_purchase""".stripMargin)),

    // Cohort retention: users grouped by first-active day, distinct
    // actives per day offset — the other canonical OLAP serving shape.
    // One user_id shuffle builds the cohort map, the events join reuses
    // it, and the final (cohort, offset) aggregate carries only 8-byte
    // ids into count_distinct partials.
    Q("q_retention",
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id"), col("ts").cast("date").as("day"))
        val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
        e.join(first, "user_id")
          .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
          .where(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(count_distinct(col("user_id")).as("active_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH f AS (SELECT user_id, min(ts::DATE) AS cohort_day FROM events GROUP BY 1)
             |SELECT cohort_day, date_diff('day', cohort_day, ts::DATE)::BIGINT AS day_offset,
             |       count(DISTINCT e.user_id) AS active_users
             |FROM events e JOIN f USING(user_id)
             |WHERE date_diff('day', cohort_day, ts::DATE) <= 7
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Time-series resample + forward fill: collapse to one value per
    // user-day (latest by ts), expand each user's [first, last] day
    // span to a dense daily grid, and carry the last observation
    // forward across gaps — the standard regularization step before
    // any downstream time-series model. The grid generator is linear
    // in (users × span days); the fill is one window per user ordered
    // by day, never a self-join. Spans start at each user's first
    // observation so the filled value is never NULL.
    Q("q_resample",
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"), col("value"), col("ts"))
        val daily = e.groupBy("user_id", "day")
          .agg(round(max_by(col("value"), col("ts")), 2).as("v"))
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
          .select("user_id", "day", "v_ff")
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (SELECT user_id, ts::DATE AS day,
             |                      round(arg_max(value, ts), 2) AS v
             |               FROM events GROUP BY 1, 2),
             |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
             |grid AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
             |         FROM span)
             |SELECT g.user_id, g.day,
             |       last_value(v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.day
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
             |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
             |ORDER BY 1, 2""".stripMargin)),

    // A92: user-journey path analysis (the behavioral-OLAP "top paths"
    // report): each user's FIRST five events (by time, event_id
    // tiebreak) form a path string; count users per path. The
    // first-k selection goes through the bounded-heap TopK on negated
    // event time (largest -t = earliest), NOT a per-user window sort —
    // a power user with 10⁷ events contributes 5 rows to the shuffle,
    // not 10⁷. Path assembly is a per-user sort of ≤ 5 structs.
    Q("q_event_paths",
      (s, d) => {
        val ev = Tables(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("neg_t", -epochS(col("ts")))
        val first5 = graft.plans.TopK.perGroup(ev, Seq("user_id"), "neg_t", "event_id", 5)
        first5.groupBy("user_id")
          .agg(concat_ws(">",
            transform(
              sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type"))).as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("users"))
          .orderBy(desc("users"), col("path"))
      },
      Some("""WITH r AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts, event_id) AS rn
             |  FROM events),
             |p AS (SELECT user_id,
             |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
             |      FROM r WHERE rn <= 5 GROUP BY 1)
             |SELECT path, count(*)::BIGINT AS users
             |FROM p GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin)),

    // A101: adjacency / sequence-pattern matching ("purchase directly
    // after view, no detour") — the MATCH_RECOGNIZE-lite primitive
    // behavioral analytics builds conversion reports from. One lead()
    // over the per-user (ts, event_id) order: NO per-user sequence
    // string is ever materialized (a power user's whole history as one
    // string is unbounded state; the window pass streams it row by
    // row), so the operator is one sort-within-user-partition pass at
    // any scale. Deterministic tiebreak on event_id keeps both engines
    // on the same neighbor when timestamps collide.
    Q("q_event_adjacency",
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("nxt", lead(col("event_type"), 1).over(byUser))
          .where(col("event_type") === "view" && col("nxt") === "purchase")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_direct"))
          .orderBy("user_id")
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |                           ORDER BY ts, event_id) AS nxt
             |  FROM events)
             |SELECT user_id, count(*)::BIGINT AS n_direct
             |FROM x WHERE event_type = 'view' AND nxt = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),
  )
}
