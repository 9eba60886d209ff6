package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join, composed from built-ins — no
  * custom physical operator needed (preference (a) of the custom-op
  * ladder): tag and union both sides, one window per key ordered by
  * (time, tag) carrying the last non-null right values forward, keep
  * left rows.
  *
  * Cost shape: ONE shuffle on the join keys + one sort within
  * partitions — the same price as the dedicated merge-based as-of
  * joins in time-series engines, with no range-explosion risk at any
  * key cardinality. Right rows at exactly the left timestamp match
  * (tag orders right before left), i.e. `r.time <= l.time` semantics —
  * identical to DuckDB's ASOF LEFT JOIN, which serves as the oracle.
  */
object AsOfJoin {

  private val Tag = "_asof_tag"

  /** @param rightValueCols right-side columns carried onto matching
    *        left rows (null where no matching right row exists); must
    *        not collide with left column names
    * @param direction "backward" (default): newest right row with
    *        `r.time <= l.time`; "forward": earliest right row with
    *        `r.time >= l.time`; "nearest": whichever of the two is
    *        closer in time, ties to backward (pandas merge_asof
    *        semantics; requires a numeric time column — distances are
    *        computed by subtraction). All three are the SAME
    *        one-shuffle plan — nearest adds a second in-partition
    *        sort, never a second shuffle.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightValueCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    // carry the right row as ONE struct so the fill is atomic:
    // per-column fills would mix values from different right rows when
    // a newer right row holds null in some value column (ASOF matches
    // the matched row wholesale, nulls included). The struct leads
    // with the right timestamp so "nearest" can compare distances.
    val payload = "_asof_payload"
    val rTime = "_asof_rt"
    val l = left.withColumn(Tag, lit(1))
    val r = right
      .select((keys :+ timeCol).map(col) :+
        struct(col(timeCol).as(rTime) +: rightValueCols.map(col): _*).as(payload): _*)
      .withColumn(Tag, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // ascending + tag puts right rows first at equal time → <= matches;
    // the descending mirror gives >= for the forward direction
    def fill(descending: Boolean) = {
      val time = if (descending) col(timeCol).desc else col(timeCol).asc
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(time, col(Tag))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col(payload), ignoreNulls = true).over(w)
    }
    val chosen = direction match {
      case "backward" => unioned.withColumn(payload, fill(descending = false))
      case "forward" => unioned.withColumn(payload, fill(descending = true))
      case "nearest" =>
        val (b, f) = (col("_asof_b"), col("_asof_f"))
        val t = col(timeCol)
        unioned
          .withColumn("_asof_b", fill(descending = false))
          .withColumn("_asof_f", fill(descending = true))
          .withColumn(payload,
            when(f.isNull, b).when(b.isNull, f)
              // tie → backward, like pandas merge_asof
              .when(t - b(rTime) <= f(rTime) - t, b)
              .otherwise(f))
          .drop("_asof_b", "_asof_f")
    }
    rightValueCols.foldLeft(chosen) { (df, c) =>
      df.withColumn(c, col(s"$payload.$c"))
    }.filter(col(Tag) === 1).drop(Tag, payload)
  }
}
