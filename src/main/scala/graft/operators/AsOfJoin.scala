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
    *        left rows (null where no prior right row exists); must not
    *        collide with left column names
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightValueCols: Seq[String]): DataFrame = {
    // carry the right row as ONE struct so the forward-fill is atomic:
    // per-column fills would mix values from different right rows when
    // a newer right row holds null in some value column (ASOF matches
    // the newest row wholesale, nulls included)
    val payload = "_asof_payload"
    val l = left.withColumn(Tag, lit(1))
    val r = right
      .select((keys :+ timeCol).map(col) :+
        struct(rightValueCols.map(col): _*).as(payload): _*)
      .withColumn(Tag, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col(Tag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
    rightValueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"$payload.$c"))
    }.filter(col(Tag) === 1).drop(Tag, payload)
  }
}
