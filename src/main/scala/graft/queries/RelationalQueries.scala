package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY.md §2.2-§2.8): projection,
  * filter, equi-join (broadcast + shuffle), semi/anti join, hash
  * aggregation, HAVING, window functions, sort/limit (top-k), distinct,
  * union-all, rollup, scalar subquery, date/string scalar functions.
  *
  * The reference delegates all of this to DuckDB via user projection SQL
  * (reference main.py:262,295); here each shape is a first-class
  * DataFrame program so Catalyst plans it (pushdown, broadcast, partial
  * aggregation) instead of us hand-scheduling anything.
  *
  * Determinism rules for the oracle hash-match: every query ends in a
  * total ORDER BY; double aggregates are rounded identically on both
  * sides; integer-typed derived columns are cast to BIGINT on both
  * sides (Spark `length`/`row_number` return INT while DuckDB returns
  * BIGINT).
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(
    // q01: TPC-H Q1-style pricing summary — partial (map-side) agg then
    // final agg on 2 low-cardinality keys; scales by data volume only.
    Q.sql(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(trunc(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(sum(CAST(trunc(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // monetary sums ride drift-free integer units (the q116
      // contract): round(sum(double), 2) drifted at the 1000x lineitem
      // (group sums ~5e12). Base price in truncated cents — NOTE this
      // is cross-engine-CONSISTENT truncation, not true decimal cents:
      // both engines truncate the same double, so price*100 landing
      // just under an integer (2098.99*100 = 209898.999…97) loses one
      // cent identically on both sides, and the integer SUM then
      // accumulates with zero drift. The discounted extension rides
      // 1e-4 units — truncated cents x (100 - 100*disc) is an exact
      // BIGINT product (~3e17 per group, well inside int64).
      // Quantity/discount averages stay double:
      // quantities are integers (exact double sums) and the 4-dp
      // rounding absorbs the discount sum's ~1e-10 drift.
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          sum(($"l_extendedprice" * 100).cast("long")).as("sum_base_cents"),
          sum(($"l_extendedprice" * 100).cast("long") *
            round((lit(1.0) - $"l_discount") * 100, 0).cast("long")).as("sum_disc_e4"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // q02: filter + narrow projection — both the predicate and the
    // 5-column ReadSchema must reach the parquet scan (PushedFilters).
    Q.sql(
      "q02_filter_project",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // q03: fact-to-fact shuffle join (lineitem⋈orders) + broadcast dims.
    // nation (25 rows) is explicitly broadcast; customer is small enough
    // that AQE may also broadcast it at bench scale — both fine.
    Q.sql(
      "q03_revenue_by_nation",
      """SELECT n_name,
        |  CAST(sum(CAST(trunc(l_extendedprice * 100) AS BIGINT) *
        |           CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // revenue in exact 1e-4 units (see q01's contract note) — the
      // double sum drifted at the 1000x lineitem
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sum(($"l_extendedprice" * 100).cast("long") *
            round((lit(1.0) - $"l_discount") * 100, 0).cast("long")).as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    },

    // q04: top-k — Spark plans TakeOrderedAndProject (per-partition
    // top-k then merge on driver), no full sort at scale.
    Q.sql(
      "q04_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },

    // q05: distinct — hash aggregate over one low-cardinality column.
    Q.sql(
      "q05_distinct_segments",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"
    ) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d).select($"c_mktsegment").distinct().orderBy($"c_mktsegment")
    },

    // q06: ranking window — 3 most recent-first orders per customer.
    // Window ordering (o_orderdate, o_orderkey) is total, so ranks are
    // deterministic. row_number cast to BIGINT to match DuckDB.
    Q.sql(
      "q06_window_rownum",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rn")
        .orderBy($"o_custkey", $"rn")
    },

    // q07: left-semi join (the reference's dup-key membership shape,
    // main.py:112-117).
    Q.sql(
      "q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select($"o_custkey")
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // q08: left-anti join (the reference's DELETE-complement shape,
    // main.py:121-129) — customers with no high-value order. The build
    // side is pre-filtered so the anti-join's hash table stays small.
    Q.sql(
      "q08_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 420000)
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter($"o_totalprice" > 420000).select($"o_custkey")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },

    // q09: union-all of heterogeneous branches then re-aggregate
    // (SURVEY §2.7 U1 generalized).
    Q.sql(
      "q09_union_counts",
      """SELECT src, id, count(*) AS cnt FROM (
        |  SELECT 'bigorder' AS src, o_orderkey AS id FROM orders WHERE o_totalprice > 300000
        |  UNION ALL
        |  SELECT 'bigline' AS src, l_orderkey AS id FROM lineitem WHERE l_quantity >= 49) t
        |GROUP BY src, id
        |ORDER BY src, id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val big = Tables.orders(s, d).filter($"o_totalprice" > 300000)
        .select(lit("bigorder").as("src"), $"o_orderkey".as("id"))
      val lines = Tables.lineitem(s, d).filter($"l_quantity" >= 49)
        .select(lit("bigline").as("src"), $"l_orderkey".as("id"))
      big.unionByName(lines)
        .groupBy($"src", $"id").agg(count(lit(1)).as("cnt"))
        .orderBy($"src", $"id")
    },

    // q10: group-by + HAVING (the reference's dup-group detection shape,
    // main.py:113-117).
    Q.sql(
      "q10_having",
      """SELECT l_partkey, l_suppkey, count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_partkey, l_suppkey
        |HAVING count(*) >= 3
        |ORDER BY l_partkey, l_suppkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(count(lit(1)).as("cnt"))
        .filter($"cnt" >= 3)
        .orderBy($"l_partkey", $"l_suppkey")
    },

    // q11: conditional aggregation (CASE inside SUM) — stays inside
    // whole-stage codegen; no UDF.
    Q.sql(
      "q11_case_agg",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(trunc(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS returned_cents,
        |  CAST(sum(CASE WHEN l_returnflag <> 'R' THEN CAST(trunc(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS kept_cents,
        |  count(*) AS cnt
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // integer cents (q116's pattern): a rounded double sum drifts
      // past 2 dp once the group magnitude crosses ~1e12 — caught by
      // the 100× certificate on this query's l_linestatus groups.
      // Cents are cross-engine-consistent TRUNCATION (see q01's note),
      // which is what makes the integer sum drift-free.
      Tables.lineitem(s, d)
        .groupBy($"l_linestatus")
        .agg(
          sum(when($"l_returnflag" === "R", ($"l_extendedprice" * 100).cast("long"))
            .otherwise(0L)).as("returned_cents"),
          sum(when($"l_returnflag" =!= "R", ($"l_extendedprice" * 100).cast("long"))
            .otherwise(0L)).as("kept_cents"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_linestatus")
    },

    // q12: date functions + aggregation by (year, month). Cast to BIGINT
    // on both sides (Spark year() is INT, DuckDB's is BIGINT). Totals
    // ride the q116 integer-cents contract: round(sum(double), 2)
    // drifted past 2 dp at the 1000x replica (group sums ~4e11 — the
    // same scale boundary that moved q11/q16/q26/q49/q60 to cents).
    Q.sql(
      "q12_month_agg",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(
          year($"o_orderdate").cast("long").as("yr"),
          month($"o_orderdate").cast("long").as("mon"))
        .agg(count(lit(1)).as("cnt"),
          sum(($"o_totalprice" * 100).cast("long")).as("total_cents"))
        .orderBy($"yr", $"mon")
    },

    // q13: string scalar functions (upper/substr/length/concat).
    Q.sql(
      "q13_string_funcs",
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .select(
          $"p_partkey",
          upper(substring($"p_name", 1, 8)).as("name_prefix"),
          length($"p_name").cast("long").as("name_len"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    },

    // q14: scalar subquery — threshold stays in-plan as a broadcast
    // cross join of a 1-row aggregate (no driver-side collect).
    Q.sql(
      "q14_above_avg",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_extendedprice > 1.5 * (SELECT avg(l_extendedprice) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val thr = li.agg((avg($"l_extendedprice") * 1.5).as("thr"))
      li.crossJoin(broadcast(thr))
        .filter($"l_extendedprice" > $"thr")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },

    // q15: rollup — NULL grouping rows coalesced to 'ALL' on both sides
    // so DuckDB/Spark null-ordering differences can't bite.
    Q.sql(
      "q15_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS cnt,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rflag, lstatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rflag"),
          coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
          $"cnt", $"sum_qty")
        .orderBy($"rflag", $"lstatus")
    },

    // q16: star join through two broadcast dims up to region rollup.
    Q.sql(
      "q16_revenue_by_region",
      """SELECT r_name,
        |  CAST(sum(CAST(trunc(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        // integer cents — 5 region groups × 60M+ rows put the double
        // sum past the 2-dp-stable magnitude (100× certificate find)
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100).cast("long"))
          .as("revenue_cents"))
        .orderBy($"r_name")
    }
  )
}
