package graft

import graft.operators.{LanguageModel, Retrieval}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("bm25: hand-computed scores on a toy corpus; non-matching docs absent") {
    // corpus: d1 = "a b a", d2 = "b c", d3 = "c c c"; terms {a, c}
    // N = 3, dl = (3, 2, 3), avgdl = 8/3
    // df(a) = 1, df(c) = 2
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c")).toDF("id", "text")
    val out = Retrieval.bm25(df, "id", "text", Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val k1 = 1.2; val b = 0.75; val n = 3.0; val avgdl = 8.0 / 3.0
    def idf(dfT: Double) = math.log(1 + (n - dfT + 0.5) / (dfT + 0.5))
    def term(tf: Double, dl: Double, dfT: Double) =
      idf(dfT) * (tf * (k1 + 1)) / (tf + (dl / avgdl * b + (1 - b)) * k1)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(math.abs(out(1L) - r4(term(2, 3, 1))) < 1e-9)          // d1: a twice
    assert(math.abs(out(2L) - r4(term(1, 2, 2))) < 1e-9)          // d2: c once
    assert(math.abs(out(3L) - r4(term(3, 3, 2))) < 1e-9)          // d3: c thrice
    // a docs-without-terms case: term absent everywhere -> empty result
    assert(Retrieval.bm25(df, "id", "text", Seq("zzz")).count() == 0)
    intercept[IllegalArgumentException] {
      Retrieval.bm25(df, "id", "text", Seq.empty)
    }
  }

  test("rrfFuse sums reciprocal ranks across lists, counts memberships") {
    val r1 = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val r2 = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(r1, r2), "id", k = 60)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused(10L) == ((r6(1.0 / 61), 1L)))
    assert(fused(20L) == ((r6(1.0 / 62 + 1.0 / 61), 2L)))
    assert(fused(30L) == ((r6(1.0 / 62), 1L)))
  }

  test("pmiCollocations: independence ratio, min-count floor, deterministic order") {
    // "x y" always adjacent (high PMI); "a b" co-occur at chance-ish rate
    val rows = (1L to 6L).map(i => (i, "x y a c b a c b a c b")) :+ (7L, "a b a b")
    val df = rows.toDF("id", "text")
    val out = LanguageModel.pmiCollocations(df, "id", "text", minCount = 5L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // every surviving pair respects the floor
    assert(out.forall(_._3 >= 5))
    // the always-adjacent pair scores strictly higher than the frequent-
    // but-independent pairs
    val xy = out.find(p => p._1 == "x" && p._2 == "y")
    assert(xy.isDefined, "x->y must survive the floor (6 occurrences)")
    assert(out.head._4 == out.map(_._4).max)
    assert(xy.get._4 == out.map(_._4).max, "x y should be the top collocation")
    // hand-check x->y PMI: c12=6, c(x)=6, c(y)=6, n_uni=70, n_bi=63
    val expected = math.log((6.0 / 63) / ((6.0 / 70) * (6.0 / 70)))
    val r4 = BigDecimal(expected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(xy.get._4 - r4) < 1e-9)
  }
}
