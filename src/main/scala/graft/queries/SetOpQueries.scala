package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Set operations, grouping sets, window frames, and date arithmetic —
  * rounding out the relational surface user projections can reach
  * (SURVEY.md §2.6-§2.8 categories marked available-via-spark.sql).
  */
object SetOpQueries {

  val all: Seq[Q] = Seq(
    // INTERSECT: nations that have both customers and suppliers
    Q.sql(
      "q24_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
        .intersect(Tables.supplier(s, d).select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    },

    // EXCEPT: nations with customers but no suppliers
    Q.sql(
      "q25_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.customer(s, d).select($"c_nationkey".as("nationkey"))
        .except(Tables.supplier(s, d).select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    },

    // GROUPING SETS: two independent 1-d rollups + grand total in one
    // pass (NULL grouping slots coalesced to 'ALL' on both sides)
    Q.sql(
      "q26_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstatus,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(trunc(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rflag, lstatus""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq.empty),
          $"l_returnflag", $"l_linestatus")
        // integer cents — the grand-total grouping set sums the whole
        // fact table (~1e12 at the 100× replica), past the 2-dp-stable
        // double magnitude (100× certificate find)
        .agg(count(lit(1)).as("cnt"),
          sum(($"l_extendedprice" * 100).cast("long")).as("total_cents"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("rflag"),
          coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
          $"cnt", $"total_cents")
        .orderBy($"rflag", $"lstatus")
    },

    // window frame: trailing 3-order moving sum per customer. A moving
    // AVERAGE would divide by 3, parking values on .xx5 rounding
    // boundaries where DuckDB's incremental frame aggregation differs
    // from Spark's in the last float bits — the sum has no systematic
    // boundary and rounds identically.
    Q.sql(
      "q27_moving_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS sum3
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          round(sum($"o_totalprice").over(w), 2).as("sum3"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // fuzzy matching: edit-distance pairs over a bounded id range —
    // the record-linkage primitive (both engines implement classic
    // Levenshtein). At scale the pair space would be blocked first
    // (e.g., by minhash bands or a length/prefix key), like the
    // near-dup operators.
    Q.sql(
      "q29_levenshtein",
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        |WHERE a.c_custkey < 100 AND b.c_custkey < 100
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_custkey" < 100)
      val a = c.select($"c_custkey".as("id_a"), $"c_name".as("name_a"))
      val b = c.select($"c_custkey".as("id_b"), $"c_name".as("name_b"))
      a.crossJoin(b)
        .filter($"id_a" < $"id_b")
        .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
        .filter($"dist" <= 1)
        .select($"id_a", $"id_b", $"dist")
        .orderBy($"id_a", $"id_b")
    },

    // ordered string aggregation (deterministic collect): Spark
    // sort_array(collect_list) + array_join == DuckDB string_agg with
    // ORDER BY. Raw collect_list would be partition-order-dependent.
    Q.sql(
      "q30_string_agg",
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM (SELECT DISTINCT user_id, event_type FROM events) t
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select($"user_id", $"event_type").distinct()
        .groupBy($"user_id")
        .agg(array_join(sort_array(collect_list($"event_type")), ",").as("types"))
        .orderBy($"user_id")
    },

    // statistical aggregates: sample stddev + Pearson correlation
    Q.sql(
      "q31_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 2) AS price_sd,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_extendedprice"), 2).as("price_sd"),
          round(corr($"l_quantity", $"l_extendedprice"), 4).as("qty_price_corr"))
        .orderBy($"l_returnflag")
    },

    // ranking window suite: ntile / percent_rank / cume_dist over a
    // total (tie-free) ordering
    Q.sql(
      "q32_rank_suite",
      """SELECT event_id,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
      Tables.events(s, d)
        .select($"event_id",
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy($"event_id")
    },

    // JSON field extraction (Spark get_json_object == DuckDB
    // json_extract_string for scalar paths)
    Q.sql(
      "q33_json_extract",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // JSON parse AFTER the sort: the final orderBy's range-bounds
      // sampling re-executes its child in full, so an expensive
      // projection below the sort is computed twice (sample pass +
      // shuffle map). Above the sort it runs once, post-shuffle, on
      // the range partitions (round 17, guide §1.4/§7.2) — identical
      // rows, identical order.
      Tables.events(s, d)
        .select($"event_id", $"props")
        .orderBy($"event_id")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
    },

    // string suite 2: reverse / translate / repeat / left-pad
    Q.sql(
      "q34_string_suite",
      """SELECT p_partkey,
        |  reverse(p_brand) AS rev_brand,
        |  translate(p_type, 'AEIOU', 'aeiou') AS lowered_vowels,
        |  repeat(substr(p_brand, 1, 2), 2) AS rep2,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size
        |FROM part
        |ORDER BY p_partkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .select($"p_partkey",
          reverse($"p_brand").as("rev_brand"),
          translate($"p_type", "AEIOU", "aeiou").as("lowered_vowels"),
          repeat(substring($"p_brand", 1, 2), 2).as("rep2"),
          lpad($"p_size".cast("string"), 4, "0").as("padded_size"))
        .orderBy($"p_partkey")
    },

    // date arithmetic: +interval, diff-to-date, end-of-month
    Q.sql(
      "q28_date_arith",
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select(
          $"o_orderkey",
          date_add(to_date($"o_orderdate"), 30).as("due_date"),
          datediff(lit("1998-12-31").cast("date"), to_date($"o_orderdate")).cast("long").as("days_to_eoy"),
          last_day(to_date($"o_orderdate")).as("month_end"))
        .orderBy($"o_orderkey")
    }
  )
}
