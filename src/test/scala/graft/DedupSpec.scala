package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    // (_row_id, k1, k2, payload)
    (1L, 1L, "a", "r1"),
    (2L, 1L, "a", "r2"),
    (3L, 1L, "b", "r3"),
    (4L, 2L, "a", "r4"),
    (5L, 1L, "a", "r5"),
    (6L, 2L, "b", "r6")
  ).toDF("_row_id", "k1", "k2", "payload")

  test("first keeps earliest occurrence per key") {
    val r = Dedup(fixture, Seq(Seq("k1", "k2")), "first")
    assert(r.survivors.select("payload").as[String].collect().sorted.toSeq ==
      Seq("r1", "r3", "r4", "r6"))
    assert(r.removed.select("payload").as[String].collect().sorted.toSeq == Seq("r2", "r5"))
    // capture carries rn like the reference's dup frame
    assert(r.removed.columns.contains("rn"))
  }

  test("last keeps final occurrence (documented semantics, SURVEY §2.5)") {
    val r = Dedup(fixture, Seq(Seq("k1", "k2")), "last")
    assert(r.survivors.select("payload").as[String].collect().sorted.toSeq ==
      Seq("r3", "r4", "r5", "r6"))
  }

  test("exclude_all removes every member of dup groups, captures without rn") {
    val r = Dedup(fixture, Seq(Seq("k1", "k2")), "exclude_all")
    assert(r.survivors.select("payload").as[String].collect().sorted.toSeq ==
      Seq("r3", "r4", "r6"))
    assert(r.removed.count() == 3)
    assert(!r.removed.columns.contains("rn"))
  }

  test("sequential multi-key fold: later keys see earlier survivors") {
    val r = Dedup(fixture, Seq(Seq("k1", "k2"), Seq("k1")), "first")
    // pass 1 on (k1,k2): survivors r1,r3,r4,r6; pass 2 on k1 alone:
    // r1 vs r3 (k1=1) keeps r1; r4 vs r6 (k1=2) keeps r4.
    assert(r.survivors.select("payload").as[String].collect().sorted.toSeq == Seq("r1", "r4"))
    assert(r.removed.count() == 4) // r2,r5 then r3,r6
  }

  test("empty key list is a no-op") {
    val r = Dedup(fixture, Seq.empty, "first")
    assert(r.survivors.count() == 6 && r.removed.count() == 0)
  }

  // property: survivors ∪ removed == input; survivors unique per key;
  // dedup idempotent — over seeded random inputs × all resolutions
  test("dedup invariants hold for random inputs and all resolutions") {
    for (seed <- 1 to 4; res <- Seq("first", "last", "exclude_all")) {
      val rnd = new scala.util.Random(seed)
      val pairs = List.fill(40)((rnd.nextLong(8) + 1, rnd.nextLong(3) + 1))
      val df = pairs.zipWithIndex
        .map { case ((k1, k2), i) => (i.toLong + 1, k1, k2) }
        .toDF("_row_id", "k1", "k2")
      val r = Dedup(df, Seq(Seq("k1", "k2")), res)
      val n = df.count()
      val s = r.survivors.count()
      assert(s + r.removed.count() == n, s"partition (seed=$seed res=$res)")
      // keys unique among survivors (first/last) or fully dup-free (exclude_all)
      val maxPerKey = r.survivors.groupBy("k1", "k2").count().agg(max("count")).as[Long].head()
      assert(maxPerKey <= 1, s"unique keys (seed=$seed res=$res)")
      // idempotence
      val again = Dedup(r.survivors, Seq(Seq("k1", "k2")), res)
      assert(again.survivors.count() == s && again.removed.count() == 0,
        s"idempotence (seed=$seed res=$res)")
    }
  }
}
