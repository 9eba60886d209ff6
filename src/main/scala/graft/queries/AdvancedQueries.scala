package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Advanced relational coverage: exact count-distinct, event-time
  * bucketing and batch sessionization over the nanosecond `ts` column,
  * exact percentiles, regex field extraction, and pivot — each with a
  * value-identical DuckDB oracle.
  *
  * Event-time arithmetic uses raw nanoseconds (`ts_ns` here,
  * `epoch_ns(ts)` in DuckDB) so the comparison is pure integer math —
  * no timestamp-conversion semantics in the hash path.
  */
object AdvancedQueries {

  private val GapNs = 30L * 60 * 1000000000L // 30 min session gap

  val all: Seq[Q] = Seq(
    Q.sql(
      "q17_count_distinct",
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .groupBy($"c_mktsegment")
        .agg(countDistinct($"c_nationkey").as("n_nations"), count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // hourly event-time buckets as pure integer arithmetic on nanos
    Q.sql(
      "q18_time_buckets",
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
        |  count(*) AS cnt,
        |  round(sum(value), 2) AS total
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(expr("ts_ns div 3600000000000").as("hour_bucket"))
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .orderBy($"hour_bucket")
    },

    // batch sessionization: session boundary = gap > 30min from the
    // previous event of the same user (lag), session id = running sum
    // of boundaries, then per-session rollup. Two stacked windows +
    // one aggregation — all on the (user_id) shuffle key.
    Q.sql(
      "q19_sessionize_batch",
      s"""SELECT user_id, session_id,
         |  count(*) AS n_events,
         |  round(sum(value), 2) AS total_value
         |FROM (
         |  SELECT user_id, value,
         |    CAST(sum(CASE WHEN prev_ns IS NULL OR ns - prev_ns > $GapNs THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ns, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM (
         |    SELECT user_id, event_id, value, epoch_ns(ts) AS ns,
         |      lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ns
         |    FROM events) t1) t2
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      Tables.events(s, d)
        .withColumn("prev_ns", lag($"ts_ns", 1).over(byUser))
        .withColumn("boundary",
          when($"prev_ns".isNull || $"ts_ns" - $"prev_ns" > GapNs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum($"boundary").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"user_id", $"session_id")
    },

    // exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont, both linear interpolation)
    Q.sql(
      "q20_percentiles",
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // distributed exact percentiles (sort window + single agg), bit-
      // identical to the built-in `percentile` per QuantilesSpec but
      // without its collect-the-group-into-one-reducer memory shape
      graft.operators.Quantiles.groupPercentiles(
        Tables.orders(s, d), "o_orderpriority", "o_totalprice",
        Seq("p50" -> 0.5, "p90" -> 0.9))
        .select($"o_orderpriority", round($"p50", 2).as("p50"), round($"p90", 2).as("p90"))
        .orderBy($"o_orderpriority")
    },

    // regex field extraction from the JSON-ish props string
    Q.sql(
      "q21_regexp_extract",
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(*) AS cnt
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          sum(regexp_extract($"props", "\"k\": (\\d+)", 1).cast("long")).as("k_sum"),
          count(lit(1)).as("cnt"))
        .orderBy($"event_type")
    },

    // as-of join: each purchase matched to the user's most recent
    // prior (or simultaneous) click — oracle is DuckDB's native ASOF
    // LEFT JOIN; Spark side is the composed union-window form
    // (AsOfJoin), one shuffle on user_id.
    Q.sql(
      "q23_asof_join",
      """SELECT l.event_id, l.user_id, r.event_id AS click_id, r.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |ORDER BY l.event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts_ns")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_ns",
          $"event_id".as("click_id"), $"value".as("click_value"))
      graft.operators.AsOfJoin.asofJoin(
        purchases, clicks, Seq("user_id"), "ts_ns", Seq("click_id", "click_value"))
        .select($"event_id", $"user_id", $"click_id", $"click_value")
        .orderBy($"event_id")
    },

    // ENGINE-NATIVE gap sessionization (session_window) — the same
    // semantics q19 composes from lag+sum, as Spark's built-in merging
    // session operator; the oracle replays the merge rule (a gap >= 30
    // min splits; note q19's composed form uses > — the built-in
    // splits at exactly the gap)
    Q.sql(
      "q65_session_window",
      """WITH t1 AS (
        |  SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS us,
        |    lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_us
        |  FROM events),
        |t2 AS (
        |  SELECT user_id, value, us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM t1)
        |SELECT user_id, min(us) AS session_start_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM t2
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
        .select($"user_id", unix_micros($"sw.start").as("session_start_us"),
          $"n_events", $"total_value")
        .orderBy($"user_id", $"session_start_us")
    },

    // forward as-of: each purchase matched to the EARLIEST following
    // click per user (the "next action after conversion" shape) —
    // same one-shuffle composed form, mirrored sort; DuckDB's native
    // forward ASOF is the oracle
    Q.sql(
      "q64_asof_forward",
      """SELECT l.event_id, l.user_id, r.event_id AS next_click_id, r.value AS next_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND r.ts >= l.ts
        |ORDER BY l.event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts_ns")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_ns",
          $"event_id".as("next_click_id"), $"value".as("next_click_value"))
      graft.operators.AsOfJoin.asofJoin(
        purchases, clicks, Seq("user_id"), "ts_ns",
        Seq("next_click_id", "next_click_value"), direction = "forward")
        .select($"event_id", $"user_id", $"next_click_id", $"next_click_value")
        .orderBy($"event_id")
    },

    // RANGE-frame window (value-based, not row-count): per user, how
    // many events and how much value landed in the TRAILING HOUR at
    // each event — the rate-limit / burst-detection shape. Exact
    // integer micros as the frame unit on both engines.
    Q.sql(
      "q67_range_frame",
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
        |  round(sum(value) OVER w, 2) AS value_last_hour
        |FROM (SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val HourUs = 3600000000L
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-HourUs, Window.currentRow)
      Tables.events(s, d)
        .select($"event_id", $"user_id", $"value", expr("ts_ns div 1000").as("us"))
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_last_hour"),
          round(sum($"value").over(w), 2).as("value_last_hour"))
        .orderBy($"event_id")
    },

    // pivot: per-user event-type counts as columns (Spark pivot with
    // pinned values; DuckDB expressed as the equivalent conditional
    // aggregation — same result relation)
    Q.sql(
      "q22_pivot",
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot($"event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy($"user_id")
    },

    // generic range join WITHOUT an equi key: every 500th event anchors
    // a 1-hour interval; count all events falling inside each. Spark's
    // naive form is a nested-loop cross product — RangeJoin bins the
    // timeline so it becomes a hash equi-join on the bin id (exact
    // integer micros both engines; DuckDB plans its native IEJoin)
    Q.sql(
      "q62_range_join",
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |iv AS (
        |  SELECT event_id AS iv_id, us AS start_us, us + 3600000000 AS end_us
        |  FROM e WHERE event_id % 500 = 0)
        |SELECT iv_id, CAST(count(*) AS BIGINT) AS n_points
        |FROM iv JOIN e ON e.us >= iv.start_us AND e.us < iv.end_us
        |GROUP BY iv_id
        |ORDER BY iv_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val HourUs = 3600000000L
      val e = Tables.events(s, d)
        .select($"event_id", expr("ts_ns div 1000").as("us")) // exact integer micros
      val iv = e.filter($"event_id" % 500 === 0)
        .select($"event_id".as("iv_id"), $"us".as("start_us"), ($"us" + HourUs).as("end_us"))
      graft.operators.RangeJoin.pointInInterval(
        e, "us", iv, "start_us", "end_us", binWidth = HourUs)
        .groupBy($"iv_id").agg(count(lit(1)).as("n_points"))
        .orderBy($"iv_id")
    },

    // interval × interval overlap join (two derived maintenance-window
    // sets), binned to a hash equi-join with exactly-once emission —
    // the session-vs-session / window-vs-window collision primitive
    Q.sql(
      "q63_interval_overlap",
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |a AS (
        |  SELECT event_id AS a_id, us AS a_start, us + 3600000000 AS a_end
        |  FROM e WHERE event_id % 500 = 0),
        |b AS (
        |  SELECT event_id AS b_id, us AS b_start, us + 1800000000 AS b_end
        |  FROM e WHERE event_id % 300 = 0)
        |SELECT a_id, CAST(count(*) AS BIGINT) AS n_overlaps
        |FROM a JOIN b ON a_start < b_end AND b_start < a_end
        |GROUP BY a_id
        |ORDER BY a_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val HourUs = 3600000000L
      val e = Tables.events(s, d)
        .select($"event_id", expr("ts_ns div 1000").as("us"))
      val a = e.filter($"event_id" % 500 === 0)
        .select($"event_id".as("a_id"), $"us".as("a_start"), ($"us" + HourUs).as("a_end"))
      val b = e.filter($"event_id" % 300 === 0)
        .select($"event_id".as("b_id"), $"us".as("b_start"), ($"us" + HourUs / 2).as("b_end"))
      graft.operators.RangeJoin.intervalOverlap(
        a, "a_start", "a_end", b, "b_start", "b_end", binWidth = HourUs)
        .groupBy($"a_id").agg(count(lit(1)).as("n_overlaps"))
        .orderBy($"a_id")
    },

    // shuffle-planner diagnostic: the join/groupBy key frequency
    // distribution of lineitem's order key — max/p99/mean and the
    // skew ratio that decides whether salting or AQE skew handling
    // is needed before a key-partitioned stage
    Q.sql(
      "q138_key_skew",
      """WITH f AS (SELECT l_orderkey AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_freq,
        |  CAST(min(c) AS BIGINT) AS min_freq,
        |  round(avg(c), 6) AS avg_freq,
        |  round(quantile_cont(c, 0.99), 6) AS p99_freq,
        |  round(max(c) / avg(c), 6) AS skew_ratio,
        |  round(stddev_pop(c) / avg(c), 6) AS cv
        |FROM f""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_orderkey".as("key")).agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_keys"),
          max($"c").as("max_freq"),
          min($"c").as("min_freq"),
          round(avg($"c"), 6).as("avg_freq"),
          round(percentile($"c", lit(0.99)), 6).as("p99_freq"),
          round(max($"c") / avg($"c"), 6).as("skew_ratio"),
          round(stddev_pop($"c") / avg($"c"), 6).as("cv"))
    }
  )
}
