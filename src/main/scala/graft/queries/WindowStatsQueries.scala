package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-2 analytic widening: event-sequence navigation (lag/lead),
  * non-equi broadcast range joins, regression aggregates, window-frame
  * value navigation (first/last/nth), and boolean/conditional
  * aggregates — each hash-matched against a DuckDB oracle.
  *
  * Scale notes: the window queries shuffle once on their partition key
  * and nothing else; the band join broadcasts a 5-row dimension into a
  * nested-loop join (the right plan for tiny non-equi dims — no
  * shuffle of the fact side at any scale).
  */
object WindowStatsQueries {

  val all: Seq[Q] = Seq(
    // per-user event sequencing: gap to previous/next event + value
    // delta, integer MICROsecond arithmetic (DuckDB truncates parquet
    // nanos to micros on read, so micros is the exact shared grain;
    // nulls at partition edges pinned to 0 so the cross-engine hash
    // sees identical scalars)
    Q.sql(
      "q36_lag_lead",
      """SELECT event_id,
        |  COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, 0) AS prev_gap_us,
        |  COALESCE(lead(epoch_us(ts)) OVER w - epoch_us(ts), 0) AS next_gap_us,
        |  round(COALESCE(value - lag(value) OVER w, 0), 2) AS value_delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select(
          $"event_id",
          coalesce($"ts_us" - lag($"ts_us", 1).over(w), lit(0L)).as("prev_gap_us"),
          coalesce(lead($"ts_us", 1).over(w) - $"ts_us", lit(0L)).as("next_gap_us"),
          round(coalesce($"value" - lag($"value", 1).over(w), lit(0.0)), 2).as("value_delta"))
        .orderBy($"event_id")
    },

    // non-equi range join: customers bucketed into balance bands via a
    // broadcast 5-row dimension (BroadcastNestedLoopJoin — the fact
    // side streams through unshuffled)
    Q.sql(
      "q37_band_range_join",
      """WITH bands(lo, hi, band) AS (VALUES
        |  (-1000.0, 0.0, 'neg'), (0.0, 2500.0, 'low'), (2500.0, 5000.0, 'mid'),
        |  (5000.0, 7500.0, 'high'), (7500.0, 10000.0, 'top'))
        |SELECT band, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val bands = Seq(
        (-1000.0, 0.0, "neg"), (0.0, 2500.0, "low"), (2500.0, 5000.0, "mid"),
        (5000.0, 7500.0, "high"), (7500.0, 10000.0, "top")).toDF("lo", "hi", "band")
      Tables.customer(s, d)
        .join(broadcast(bands), $"c_acctbal" >= $"lo" && $"c_acctbal" < $"hi")
        .groupBy($"band")
        .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("total_bal"))
        .orderBy($"band")
    },

    // linear-regression aggregates (slope/intercept/r²/count) of price
    // vs quantity per return flag — single hash aggregate, no shuffle
    // beyond the group-by
    Q.sql(
      "q38_regr_suite",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(regr_slope($"l_extendedprice", $"l_quantity"), 4).as("slope"),
          round(regr_intercept($"l_extendedprice", $"l_quantity"), 2).as("icept"),
          round(regr_r2($"l_extendedprice", $"l_quantity"), 6).as("r2"),
          regr_count($"l_extendedprice", $"l_quantity").cast("long").as("n"))
        .orderBy($"l_returnflag")
    },

    // window-frame value navigation: first/last/2nd order price per
    // customer over the full-partition frame, tie-free ordering
    Q.sql(
      "q39_first_last_nth",
      """SELECT o_orderkey,
        |  round(first_value(o_totalprice) OVER w, 2) AS first_price,
        |  round(last_value(o_totalprice) OVER w, 2) AS last_price,
        |  round(COALESCE(nth_value(o_totalprice, 2) OVER w, 0), 2) AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        $"o_orderkey",
        round(first($"o_totalprice").over(w), 2).as("first_price"),
        round(last($"o_totalprice").over(w), 2).as("last_price"),
        round(coalesce(nth_value($"o_totalprice", 2).over(w), lit(0.0)), 2).as("second_price"))
        .orderBy($"o_orderkey")
    },

    // winsorization (outlier clipping to in-group [p05, p95]): group
    // quantiles computed once on a tiny aggregate, broadcast back,
    // clip + re-aggregate — two passes over the fact, zero fact-side
    // shuffles beyond the group-bys
    Q.sql(
      "q49_winsorize",
      """WITH q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CAST(count(*) FILTER (WHERE l_extendedprice < lo) AS BIGINT) AS n_low,
        |  CAST(count(*) FILTER (WHERE l_extendedprice > hi) AS BIGINT) AS n_high,
        |  CAST(sum(CAST(trunc(least(greatest(l_extendedprice, lo), hi) * 100) AS BIGINT)) AS BIGINT) AS clipped_cents
        |FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        |GROUP BY 1
        |ORDER BY 1""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      // distributed exact percentiles (sort window + single agg) — NOT
      // the built-in `percentile`, which collects each group into one
      // reducer's memory; QuantilesSpec proves them bit-identical
      val q = graft.operators.Quantiles.groupPercentiles(
        li, "l_returnflag", "l_extendedprice", Seq("lo" -> 0.05, "hi" -> 0.95))
      li.join(broadcast(q), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(
          count_if($"l_extendedprice" < $"lo").as("n_low"),
          count_if($"l_extendedprice" > $"hi").as("n_high"),
          // integer cents (q116's pattern): the per-row clip, ×100 and
          // truncation are IEEE-identical in both engines, and BIGINT
          // sums are associative — a rounded double sum drifts past
          // 2 dp once the group's magnitude crosses ~1e12 (caught by
          // the 100× certificate, 60M rows per group)
          sum((least(greatest($"l_extendedprice", $"lo"), $"hi") * 100).cast("long"))
            .as("clipped_cents"))
        .orderBy($"l_returnflag")
    },

    // multi-column winsorization in ONE operator: both value columns'
    // exact per-group bounds come from a single unpivoted sort shuffle
    // (Quantiles.winsorize), then clip + aggregate
    Q.sql(
      "q60_winsorize_multi",
      """WITH q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS plo,
        |    quantile_cont(l_extendedprice, 0.95) AS phi,
        |    quantile_cont(l_quantity, 0.05) AS qlo,
        |    quantile_cont(l_quantity, 0.95) AS qhi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CAST(sum(CAST(trunc(least(greatest(l_extendedprice, plo), phi) * 100) AS BIGINT)) AS BIGINT) AS clipped_price_cents,
        |  CAST(sum(CAST(trunc(least(greatest(l_quantity, qlo), qhi) * 100) AS BIGINT)) AS BIGINT) AS clipped_qty_cents
        |FROM lineitem l JOIN q USING (l_returnflag)
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val clipped = graft.operators.Quantiles.winsorize(
        Tables.lineitem(s, d), "l_returnflag", Seq("l_extendedprice", "l_quantity"))
      clipped.groupBy($"l_returnflag")
        .agg(
          // integer cents — see q49's note: exact associative sums are
          // the only formulation that hash-matches at every scale
          sum(($"l_extendedprice" * 100).cast("long")).as("clipped_price_cents"),
          sum(($"l_quantity" * 100).cast("long")).as("clipped_qty_cents"))
        .orderBy($"l_returnflag")
    },

    // time-series resampling: densify each user's hourly series over
    // their [min, max] span, zero-filling gap buckets — grid generated
    // from the tiny per-user span table (explode of sequence), never
    // from the fact side
    Q.sql(
      "q52_resample",
      """WITH b AS (
        |  SELECT user_id AS uid, epoch_us(ts) // 3600000000 AS hb, count(*) AS cnt,
        |         round(sum(value), 2) AS total
        |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
        |span AS (
        |  SELECT uid, min(hb) AS lo, max(hb) AS hi FROM b GROUP BY uid),
        |grid AS (
        |  SELECT uid, unnest(range(lo, hi + 1)) AS hb FROM span)
        |SELECT g.uid AS user_id, g.hb AS hour_bucket,
        |  CAST(COALESCE(b.cnt, 0) AS BIGINT) AS cnt,
        |  COALESCE(b.total, 0.0) AS total
        |FROM grid g LEFT JOIN b ON b.uid = g.uid AND b.hb = g.hb
        |ORDER BY user_id, hour_bucket""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val b = Tables.events(s, d).filter($"user_id" < 10)
        .withColumn("hour_bucket", expr("(ts_ns div 1000) div 3600000000"))
        .groupBy($"user_id", $"hour_bucket")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
      val grid = b.groupBy($"user_id")
        .agg(min($"hour_bucket").as("lo"), max($"hour_bucket").as("hi"))
        .select($"user_id", explode(sequence($"lo", $"hi")).as("hour_bucket"))
      grid.join(b, Seq("user_id", "hour_bucket"), "left")
        .select($"user_id", $"hour_bucket",
          coalesce($"cnt", lit(0L)).as("cnt"),
          coalesce($"total", lit(0.0)).as("total"))
        .orderBy($"user_id", $"hour_bucket")
    },

    // bitwise aggregate family + scalar bit arithmetic
    Q.sql(
      "q51_bitwise",
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS ba,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS bo,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bx,
        |  CAST(sum(l_orderkey & 255) AS BIGINT) AS masked_sum
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          bit_and($"l_linenumber").cast("long").as("ba"),
          bit_or($"l_linenumber").cast("long").as("bo"),
          bit_xor($"l_linenumber").cast("long").as("bx"),
          sum($"l_orderkey".bitwiseAND(255)).cast("long").as("masked_sum"))
        .orderBy($"l_returnflag")
    },

    // ordered conversion funnel (view → click → purchase): first
    // occurrence per stage per user via conditional min, stage
    // ordering checked in one pass — a single group-by over events,
    // no joins, no re-scans per stage
    Q.sql(
      "q50_funnel",
      """WITH t AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(count(t_view) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_click,
        |  CAST(count(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END) AS BIGINT) AS n_full
        |FROM t""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts_us")).as("t_view"),
          min(when($"event_type" === "click", $"ts_us")).as("t_click"),
          min(when($"event_type" === "purchase", $"ts_us")).as("t_buy"))
        .agg(
          count(lit(1)).as("n_users"),
          count($"t_view").as("n_view"),
          count(when($"t_click" > $"t_view", 1)).as("n_view_click"),
          count(when($"t_buy" > $"t_click" && $"t_click" > $"t_view", 1)).as("n_full"))
    },

    // boolean + conditional aggregates per order priority
    Q.sql(
      "q40_bool_aggs",
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_orderstatus = 'F') AS any_f,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          bool_and($"o_totalprice" > 1000).as("all_over_1k"),
          bool_or($"o_orderstatus" === "F").as("any_f"),
          count_if($"o_totalprice" > 150000).as("n_big"))
        .orderBy($"o_orderpriority")
    },

    // trailing exponentially-weighted moving average per user (8
    // terms, weight 1/2 — every coefficient an exact dyadic double,
    // so the sums replay bit-identically cross-engine); early rows
    // renormalize over their shorter history
    Q.sql(
      "q102_ewma",
      """SELECT event_id, user_id,
        |  round((
        |    CASE WHEN lag(value, 0) OVER w IS NOT NULL THEN lag(value, 0) OVER w * 1.0 ELSE 0.0 END
        |    + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN lag(value, 1) OVER w * 0.5 ELSE 0.0 END
        |    + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN lag(value, 2) OVER w * 0.25 ELSE 0.0 END
        |    + CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN lag(value, 3) OVER w * 0.125 ELSE 0.0 END
        |    + CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN lag(value, 4) OVER w * 0.0625 ELSE 0.0 END
        |    + CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN lag(value, 5) OVER w * 0.03125 ELSE 0.0 END
        |    + CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN lag(value, 6) OVER w * 0.015625 ELSE 0.0 END
        |    + CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN lag(value, 7) OVER w * 0.0078125 ELSE 0.0 END
        |  ) / (
        |    CASE WHEN lag(value, 0) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END
        |    + CASE WHEN lag(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END
        |    + CASE WHEN lag(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END
        |    + CASE WHEN lag(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END
        |    + CASE WHEN lag(value, 4) OVER w IS NOT NULL THEN 0.0625 ELSE 0.0 END
        |    + CASE WHEN lag(value, 5) OVER w IS NOT NULL THEN 0.03125 ELSE 0.0 END
        |    + CASE WHEN lag(value, 6) OVER w IS NOT NULL THEN 0.015625 ELSE 0.0 END
        |    + CASE WHEN lag(value, 7) OVER w IS NOT NULL THEN 0.0078125 ELSE 0.0 END
        |  ), 6) AS ewma
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"event_id", $"user_id",
          graft.operators.SeriesStats.ewmaTrailing(
            Seq("user_id"), Seq("ts", "event_id"), "value").as("ewma"))
        .orderBy($"event_id")
    },

    // robust per-type outliers: |v - median| > 3 x MAD — the
    // estimator outliers cannot drag; two exact distributed medians
    Q.sql(
      "q107_mad_outliers",
      """WITH m AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |d AS (
        |  SELECT e.event_id, e.event_type, e.value, m.med,
        |    round(abs(e.value - m.med), 6) AS dev
        |  FROM events e JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_id, d.event_type, round(d.value, 6) AS value, d.med, md.mad, d.dev
        |FROM d JOIN md USING (event_type)
        |WHERE d.dev > 3.0 * md.mad
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      graft.operators.Quantiles.madOutliers(
        Tables.events(s, d).select($"event_id", $"event_type", $"value"),
        "event_type", "value", k = 3.0)
        .select($"event_id", $"event_type",
          round($"value", 6).as("value"), $"med", $"mad", $"dev")
        .orderBy($"event_id")
    },

    // weekly cohort retention triangle: users cohorted by first-event
    // week, per-cell active share — exact whole-day arithmetic
    Q.sql(
      "q108_retention",
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
        |  FROM events),
        |cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_n FROM f GROUP BY cohort_week),
        |cells AS (
        |  SELECT f.cohort_week, CAST((a.active_week - f.cohort_week) // 7 AS BIGINT) AS week_offset,
        |    CAST(count(*) AS BIGINT) AS active_users
        |  FROM a JOIN f USING (user_id)
        |  GROUP BY f.cohort_week, week_offset)
        |SELECT c.cohort_week, c.week_offset, c.active_users, cs.cohort_n,
        |  round(CAST(c.active_users AS DOUBLE) / cs.cohort_n, 6) AS retention
        |FROM cells c JOIN cs USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      graft.operators.SeriesStats.cohortRetention(
        Tables.events(s, d), "user_id", "ts")
        .orderBy($"cohort_week", $"week_offset")
    },

    // two-stage salted aggregation vs the plain GROUP BY oracle: the
    // hot-key mitigation is only correct if the (key, salt) partial +
    // final combine is EXACTLY the direct aggregate — integer cents
    // keep the sums associative so the hash match is airtight
    Q.sql(
      "q116_salted_agg",
      """SELECT event_type,
        |  CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      graft.operators.SkewTools.saltedAggregate(
        Tables.events(s, d)
          .select($"event_type", ($"value" * 100).cast("long").as("_cents")),
        Seq("event_type"), saltBuckets = 16)(
        Seq(sum($"_cents").as("_pc"), count(lit(1)).as("_c")),
        Seq(sum($"_pc").as("cents"), sum($"_c").as("n")))
        .orderBy($"event_type")
    },

    // salted fact-dim join vs the plain equi-join oracle: dim rows are
    // replicated per salt, so the certificate is that every fact row
    // still matches EXACTLY once (total_w = n x key length)
    Q.sql(
      "q117_salted_join",
      """WITH dim AS (
        |  SELECT DISTINCT event_type, CAST(length(event_type) AS BIGINT) AS w
        |  FROM events)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(d.w) AS BIGINT) AS total_w
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val dim = ev.select($"event_type").distinct()
        .withColumn("w", length($"event_type").cast("long"))
      graft.operators.SkewTools.saltedJoin(
        ev.select($"event_type"), dim, Seq("event_type"), saltBuckets = 8)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"w").as("total_w"))
        .orderBy($"event_type")
    },

    // distribution drift alarm: two-sample Kolmogorov-Smirnov between
    // click and purchase value distributions — ties collapse in ONE
    // partial-agg'd groupBy, then two cumulative windows over the
    // at-most-|distinct values| frame
    Q.sql(
      "q128_ks_drift",
      """WITH c AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY v),
        |cum AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma,
        |  sum(cb) OVER (ORDER BY v) AS cumb FROM c),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c)
        |SELECT round(max(abs(cuma * 1.0 / n_a - cumb * 1.0 / n_b)), 6) AS ks_stat,
        |  max(n_a) AS n_a, max(n_b) AS n_b
        |FROM cum CROSS JOIN t""".stripMargin
    ) { (s, d) =>
      graft.operators.Learning.ksTwoSample(
        Tables.events(s, d), "value", "event_type", "click", "purchase")
    }
  )
}
