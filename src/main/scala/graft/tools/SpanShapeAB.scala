package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash60, tokens}

/** A/B harness for the duplicate-n-gram frequency shape that feeds
  * q89/q90 (and, collapsed, q99): the production window-count
  * (`count(*) OVER (PARTITION BY nh)` — ONE full-stream shuffle plus
  * a full-stream sort inside WindowExec) versus a map-side-combinable
  * `groupBy(nh).count` + SHUFFLE_HASH left-semi join back (TWO
  * full-stream shuffles, ZERO full-stream sorts). At the fourth
  * decade the position stream is ~10^9 rows, so the sort is the
  * dominant cost if it spills; the A/B decides with a measurement,
  * not a guess.
  *
  * Usage: runMain graft.tools.SpanShapeAB <dataDir> [reps]
  * Prints per-shape wall seconds for the span-detect pipeline
  * (islands merged, noop sink) and a row-count cross-check.
  *
  * MEASURED (round 14, 100× docs replica, 500k docs, local[32]/80g):
  * window 8.3/7.7 s vs semijoin 20.0/27.3 s — the window's single
  * shuffle+sort beats two full-stream shuffles decisively; the
  * production shape stays. A second probe (native incremental-md5
  * NgramHash60 expression replacing the composed md5-hex/conv chain)
  * measured a WASH at the same replica (9.9/8.3 s) and was reverted:
  * the operator's cost is the 10^9-row position stream, not per-gram
  * hash constants. Both negative results recorded in BENCH_NOTES.
  */
object SpanShapeAB {

  private def ngramHashes(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), tokens(lower(col("text"))).as("_w"))
      .filter(size(col("_w")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("_w")) - n),
          i => hash60(concat_ws(" ", slice(col("_w"), i + 1, lit(n))))))
        .as(Seq("pos", "nh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("nh"))

  private def islands(dupWins: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    dupWins
      .withColumn("_brk",
        when(col("s") > coalesce(prevMax, lit(-1L)), 1).otherwise(0))
      .withColumn("_g", sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("_g"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .drop("_g")
  }

  /** production shape: unordered window count over nh */
  private def viaWindow(docs: DataFrame, n: Int): DataFrame = {
    val ng = ngramHashes(docs, n)
    islands(
      ng.withColumn("_c", count(lit(1)).over(Window.partitionBy(col("nh"))))
        .filter(col("_c") > 1)
        .select(col("doc_id"), col("pos").as("s"), (col("pos") + (n - 1)).as("e")))
  }

  /** candidate shape: groupBy count + shuffle-hash semi join */
  private def viaSemiJoin(docs: DataFrame, n: Int): DataFrame = {
    val ng = ngramHashes(docs, n)
    val dup = ng.groupBy(col("nh")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1).select(col("nh"))
    islands(
      ng.join(dup.hint("shuffle_hash"), Seq("nh"), "left_semi")
        .select(col("doc_id"), col("pos").as("s"), (col("pos") + (n - 1)).as("e")))
  }


  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(tag: String, f: => DataFrame): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[ab] $tag%-10s rep$r ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    // SPARK_GRAFT_AB_CHECK=0 skips the equivalence pass for pure
    // timing runs (it executes both pipelines once more, doubling
    // tool runtime at large replicas). The check itself is a
    // symmetric-difference count, not a row-count compare — equal
    // counts with differing span contents must not read as MATCH.
    if (sys.env.getOrElse("SPARK_GRAFT_AB_CHECK", "1") != "0") {
      // persist both sides first: each exceptAll direction consumes
      // both frames, so unpersisted inputs would execute each heavy
      // pipeline TWICE (4 full runs instead of 2 at the big replicas
      // the skip flag exists for)
      val a = viaWindow(docs, 8).persist()
      val b = viaSemiJoin(docs, 8).persist()
      try {
        val onlyA = a.exceptAll(b).count()
        val onlyB = b.exceptAll(a).count()
        println(s"[ab] span diff window-only=$onlyA semijoin-only=$onlyB " +
          (if (onlyA == 0 && onlyB == 0) "MATCH" else "MISMATCH"))
      } finally { a.unpersist(); b.unpersist(); () }
    } else println("[ab] equivalence check skipped (SPARK_GRAFT_AB_CHECK=0)")
    time("window", viaWindow(docs, 8))
    time("semijoin", viaSemiJoin(docs, 8))
    spark.stop()
  }
}
