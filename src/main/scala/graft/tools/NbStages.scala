package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q140 naive-bayes pipeline (scratch). */
object NbStages {
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
    import graft.functions.TextFunctions.tokens

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val docs = graft.Tables.documents(spark, sfDir)
      val docToks = time("docToks checkpoint") {
        docs.select(col("doc_id").as("_id"),
          col("source").cast("string").as("cls"),
          explode(tokens(lower(col("text")))).as("tok"))
          .groupBy(col("_id"), col("cls"), col("tok"))
          .agg(count(lit(1)).as("_cnt"))
          .localCheckpoint(true)
      }
      val clsDocsRows = time("clsDocs collect") {
        docs.groupBy(col("source").cast("string").as("cls"))
          .agg(count(lit(1)).as("nd")).collect()
      }
      val tokCls = docToks.groupBy(col("tok"), col("cls")).agg(sum(col("_cnt")).as("c"))
      val probe = time("probe collect") {
        tokCls.limit(300001).collect()
      }
      println(s"  probe rows: ${probe.length}, classes: ${clsDocsRows.length}")
      val full = time("full operator") {
        graft.operators.Learning.naiveBayesConfusion(docs, "doc_id", "text", "source")
          .orderBy(col("cls"), col("pred"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
