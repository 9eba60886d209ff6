package graft

import graft.sinks.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def avgSpanFrac(dir: String, c: String): Double = {
    val global = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val span = global.getDouble(1) - global.getDouble(0)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath)
    val fracs = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(1) - r.getDouble(0)) / span
    }
    fracs.sum / fracs.length
  }

  test("z-ordered files cluster every z dimension; a single-column sort only one") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
    val zDir = tmpDir("zorder") + "/z"
    ZOrder.writeZOrdered(orders, zDir, Seq("o_custkey", "o_totalprice"), numFiles = 8)
    // lossless
    assert(spark.read.parquet(zDir).count() == orders.count())
    // BOTH dimensions are clustered: each file covers a fraction of
    // each column's range, so min/max stats prune on either filter
    val zCust = avgSpanFrac(zDir, "o_custkey")
    val zPrice = avgSpanFrac(zDir, "o_totalprice")
    assert(zCust < 0.75, s"z custkey span $zCust")
    assert(zPrice < 0.70, s"z totalprice span $zPrice")

    // baseline: range-partitioned+sorted on custkey alone — custkey
    // clusters tightly but totalprice spans ~the full range per file
    val sDir = tmpDir("zorder") + "/single"
    orders.repartitionByRange(8, $"o_custkey").sortWithinPartitions($"o_custkey")
      .write.mode("overwrite").parquet(sDir)
    assert(avgSpanFrac(sDir, "o_custkey") < 0.3)
    assert(avgSpanFrac(sDir, "o_totalprice") > 0.8)
  }

  test("zValueFor rejects too many dimensions and empty column lists") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException] { ZOrder.zValueFor(df, Seq.empty) }
    intercept[IllegalArgumentException] {
      ZOrder.zValueFor(df, (1 to 9).map(_ => "a"))
    }
  }
}
