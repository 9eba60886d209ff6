package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the edit-distance-1 pipeline (scratch). */
object Q74Stages {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val vocab = spark.read.parquet(s"$sfDir/customer.parquet")
        .select(col("c_name").as("w")).distinct()
      val base = vocab.select(col("w"))
      val w = col("w")
      val positions = when(length(w) >= 1, sequence(lit(1), length(w)))
        .otherwise(array_repeat(lit(1), 0))
      val keys = concat(
        array(struct(xxhash64(w).as("kh"), lit(0).as("pos"))),
        transform(positions, i =>
          struct(
            xxhash64(concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w)))).as("kh"),
            i.as("pos"))))
      val keyed = base.select(w, explode(keys).as("kp"))
        .select(col("w"), col("kp.kh").as("kh"), col("kp.pos").as("pos"))
      time("keyed noop")(noop(keyed))
      val buckets = keyed.groupBy("kh")
        .agg(collect_list(struct(col("w"), col("pos"))).as("ms"))
        .filter(size(col("ms")) > 1)
      time("buckets noop")(noop(buckets))
      println("buckets rows: " + buckets.count())
      val pairs = buckets.select(explode(flatten(transform(col("ms"),
          (a, i) => transform(
            filter(
              slice(col("ms"), i + lit(2), size(col("ms"))),
              b => (a("pos") === b("pos") || a("pos") === 0 || b("pos") === 0) &&
                a("w") =!= b("w")),
            b => struct(
              least(a("w"), b("w")).as("word_a"),
              greatest(a("w"), b("w")).as("word_b")))))).as("p"))
        .select(col("p.word_a"), col("p.word_b"))
      time("pairs noop")(noop(pairs))
      println("pairs rows: " + pairs.count())
      val verified = pairs
        .withColumn("dist", levenshtein(col("word_a"), col("word_b"), 1).cast("long"))
        .filter(col("dist") >= 1)
        .dropDuplicates("word_a", "word_b")
        .select(col("word_a"), col("word_b"), col("dist"))
      time("verified noop")(noop(verified))
      time("full with orderBy")(noop(verified.orderBy(col("word_a"), col("word_b"))))
    }
    spark.stop()
  }
}
