package graft
// temporary profiling main (removed after use)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TextFunctions}

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.1f s  -> $r"); r
    }
    import TextFunctions._
    val docs = Tables.documents(spark, d)
    docs.count()
    def build() = docs.select(col("doc_id"),
        GraftFunctions.hash60Array(shingles(tokens(col("text")), 2)).as("sh"))
      .withColumn("sig", GraftFunctions.minhashSig(col("sh"), 12))
    time("A no-filter no-persist")(build().count())
    time("B +filter")(build().filter(size(col("sh")) > 0).count())
    val p1 = build().persist()
    time("C +persist only")(p1.count())
    p1.unpersist()
    val p2 = build().filter(size(col("sh")) > 0).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("D +filter+persist")(p2.count())
    spark.stop()
  }
}
