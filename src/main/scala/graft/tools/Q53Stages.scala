package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q53 repetition pipeline (scratch). */
object Q53Stages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def grams(toks: Column, n: Int): Column = {
      val g = transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
      when(size(toks) >= n, g).otherwise(array())
    }

    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val base = graft.Tables.documents(spark, sfDir)
        .select($"doc_id", tokens($"text").as("w"))
        .filter(size($"w") >= 3)
      time("base only")(noop(base))
      val bi0 = base.select($"doc_id", explode(grams($"w", 2)).as("g"))
      time("bi explode")(noop(bi0))
      val bi1 = bi0.groupBy("doc_id", "g").agg(count("*").as("c"))
      time("bi explode+agg")(noop(bi1))
      val bi = bi1.groupBy("doc_id").agg(
        round(max(col("c")).cast("double") / sum(col("c")), 4).as("top_bigram_frac"))
      time("bi full")(noop(bi))
      val tri = base.select($"doc_id", explode(grams($"w", 3)).as("g"))
        .groupBy("doc_id", "g").agg(count("*").as("c"))
        .groupBy("doc_id").agg(
          round(sum(when(col("c") >= 2, col("c")).otherwise(0L)).cast("double") / sum(col("c")), 4)
            .as("dup_trigram_frac"))
      time("tri full")(noop(tri))
      val joined = base.select($"doc_id", size($"w").cast("long").as("n_tokens"))
        .join(bi, "doc_id").join(tri, "doc_id")
      time("joined (no sort)")(noop(joined))
      time("joined + orderBy")(noop(joined.orderBy($"doc_id")))
      val entry = graft.SparkEntry.queries("q53_repetition")
      time("SparkEntry q53")(noop(entry(spark, sfDir)))
    }
    spark.stop()
  }
}
