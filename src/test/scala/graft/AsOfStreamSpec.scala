package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming as-of enrichment (interval join → windowed argmax, the
  * supported two-stateful-operator chain).
  */
class AsOfStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("asofEnrich picks the latest prior right row within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = EventStream.asofEnrich(
      buys.toDF(), views.toDF(), "user_id",
      horizon = "15 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_stream").outputMode("append").start()
    views.addData(
      Event(100, ts(0), 1, "view", 0.0), // older view, superseded
      Event(101, ts(4), 1, "view", 0.0), // the latest prior → the match
      Event(102, ts(6), 1, "view", 0.0), // AFTER the purchase → excluded
      Event(103, ts(0), 2, "view", 0.0)) // >15 min before u2's purchase → out of horizon
    buys.addData(
      Event(10, ts(5), 1, "buy", 9.0),
      Event(11, ts(20), 2, "buy", 9.0),
      Event(12, ts(5), 3, "buy", 9.0))   // no views at all → no row
    query.processAllAvailable()
    // far-future rows on both sides advance the watermark past every
    // finalize window (the join delays it by the horizon)
    views.addData(Event(900, ts(59), 9, "view", 0.0))
    buys.addData(Event(901, ts(59), 9, "buy", 0.0))
    query.processAllAvailable()
    val got = spark.table("asof_stream")
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toMap
    query.stop()
    assert(got.get(10L).contains(101L), s"got=$got")
    assert(!got.contains(11L), s"out-of-horizon view matched: $got")
    assert(!got.contains(12L), s"viewless purchase emitted: $got")
  }

  test("asofEnrich left_outer emits every left row exactly once, nulls for the match-less") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = EventStream.asofEnrich(
      buys.toDF(), views.toDF(), "user_id",
      horizon = "15 minutes", watermark = "5 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("asof_outer").outputMode("append").start()
    views.addData(
      Event(100, ts(0), 1, "view", 0.0),
      Event(101, ts(4), 1, "view", 0.0), // the latest prior for u1's buy
      Event(103, ts(0), 2, "view", 0.0)) // >15 min before u2's buy → out of horizon
    buys.addData(
      Event(10, ts(5), 1, "buy", 9.0),   // matched
      Event(11, ts(20), 2, "buy", 9.0),  // horizon-expired view → NULL enrichment
      Event(12, ts(5), 3, "buy", 9.0))   // no views at all → NULL enrichment
    query.processAllAvailable()
    views.addData(Event(900, ts(59), 9, "view", 0.0))
    buys.addData(Event(901, ts(59), 9, "buy", 0.0))
    query.processAllAvailable()
    val got = spark.table("asof_outer")
      .select($"left_id", $"right_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    query.stop()
    assert(got.get(10L).contains(Some(101L)), s"matched row wrong: $got")
    assert(got.get(11L).contains(None), s"out-of-horizon buy must emit with nulls: $got")
    assert(got.get(12L).contains(None), s"viewless buy must emit with nulls: $got")
    // exactly-once: three real left rows, three output rows (the
    // watermark pusher's self-match may add its own later row)
    assert(Set(10L, 11L, 12L).subsetOf(got.keySet) &&
      got.keySet.forall(Set(10L, 11L, 12L, 901L)), s"unexpected rows: $got")
  }

  test("asofEnrich left_outer agrees with inner on the matched subset") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = EventStream.asofEnrich(
      buys.toDF(), views.toDF(), "user_id",
      horizon = "15 minutes", watermark = "5 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("asof_outer_match").outputMode("append").start()
    views.addData(
      Event(200, ts(3), 1, "view", 0.0),
      Event(201, ts(3), 1, "view", 0.0), // same ts → larger id wins, like inner
      Event(202, ts(5), 1, "view", 0.0)) // simultaneous → inclusive, like inner
    buys.addData(Event(20, ts(5), 1, "buy", 9.0))
    query.processAllAvailable()
    views.addData(Event(900, ts(59), 9, "view", 0.0))
    buys.addData(Event(901, ts(59), 9, "buy", 0.0))
    query.processAllAvailable()
    val got = spark.table("asof_outer_match")
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toMap
    query.stop()
    // the matched path is untouched by the outer dial: the null
    // candidate only exists for match-less state, so the argmax and
    // its tie-break are identical to the inner chain's
    assert(got.get(20L).contains(202L), s"got=$got")
  }

  test("asofEnrich ties on timestamp break to the larger right id, deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = EventStream.asofEnrich(
      buys.toDF(), views.toDF(), "user_id",
      horizon = "15 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_ties").outputMode("append").start()
    views.addData(
      Event(200, ts(3), 1, "view", 0.0),
      Event(201, ts(3), 1, "view", 0.0), // same ts → larger id wins
      Event(202, ts(5), 1, "view", 0.0)) // simultaneous WITH the buy → inclusive match
    buys.addData(Event(20, ts(5), 1, "buy", 9.0))
    query.processAllAvailable()
    views.addData(Event(900, ts(59), 9, "view", 0.0))
    buys.addData(Event(901, ts(59), 9, "buy", 0.0))
    query.processAllAvailable()
    val got = spark.table("asof_ties")
      .select($"left_id", $"right_id", $"right_ts").as[(Long, Long, Timestamp)]
      .collect().toSeq
    query.stop()
    assert(got == Seq((20L, 202L, ts(5))), s"got=$got")
  }

  test("asofEnrich matches the batch as-of on the same horizon-filtered data") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val viewRows = Seq.tabulate(30)(i => Event(100L + i, ts(rnd.nextInt(50)), 1L + rnd.nextInt(3), "view", 0.0))
    val buyRows = Seq.tabulate(15)(i => Event(10L + i, ts(rnd.nextInt(50)), 1L + rnd.nextInt(4), "buy", 9.0))
    // batch reference: horizon-filtered backward as-of
    val expect = buyRows.flatMap { b =>
      val cands = viewRows.filter(v => v.user_id == b.user_id &&
        !v.ts.after(b.ts) && v.ts.getTime >= b.ts.getTime - 15 * 60000L)
      if (cands.isEmpty) None
      else {
        val m = cands.maxBy(v => (v.ts.getTime, v.event_id))
        Some(b.event_id -> m.event_id)
      }
    }.toMap
    val views = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = EventStream.asofEnrich(
      buys.toDF(), views.toDF(), "user_id",
      horizon = "15 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_fuzz").outputMode("append").start()
    views.addData(viewRows: _*)
    buys.addData(buyRows: _*)
    query.processAllAvailable()
    val far = Timestamp.valueOf("2024-01-01 03:00:00")
    views.addData(Event(900, far, 9, "view", 0.0))
    buys.addData(Event(901, far, 9, "buy", 0.0))
    query.processAllAvailable()
    val got = spark.table("asof_fuzz")
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toMap
    query.stop()
    assert(got == expect, s"got=$got want=$expect")
  }

  test("asofEnrich left_outer matches the batch LEFT reference, seeded random data") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new scala.util.Random(seed)
      val viewRows = Seq.tabulate(30)(i =>
        Event(100L + i, ts(rnd.nextInt(50)), 1L + rnd.nextInt(3), "view", 0.0))
      val buyRows = Seq.tabulate(15)(i =>
        Event(10L + i, ts(rnd.nextInt(50)), 1L + rnd.nextInt(5), "buy", 9.0))
      // batch reference: EVERY buy appears; match-less ones map to None
      val expect: Map[Long, Option[Long]] = buyRows.map { b =>
        val cands = viewRows.filter(v => v.user_id == b.user_id &&
          !v.ts.after(b.ts) && v.ts.getTime >= b.ts.getTime - 15 * 60000L)
        b.event_id -> (if (cands.isEmpty) None
                       else Some(cands.maxBy(v => (v.ts.getTime, v.event_id)).event_id))
      }.toMap
      val views = MemoryStream[Event]
      val buys = MemoryStream[Event]
      val query = EventStream.asofEnrich(
        buys.toDF(), views.toDF(), "user_id",
        horizon = "15 minutes", watermark = "5 minutes", joinType = "left_outer")
        .writeStream.format("memory").queryName(s"asof_ofuzz_$seed")
        .outputMode("append").start()
      views.addData(viewRows: _*)
      buys.addData(buyRows: _*)
      query.processAllAvailable()
      val far = Timestamp.valueOf("2024-01-01 03:00:00")
      views.addData(Event(900, far, 9, "view", 0.0))
      buys.addData(Event(901, far, 9, "buy", 0.0))
      query.processAllAvailable()
      val got = spark.table(s"asof_ofuzz_$seed")
        .filter($"left_id" < 900L) // drop the watermark pusher's own row
        .select($"left_id", $"right_id").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      query.stop()
      assert(got == expect, s"seed=$seed got=$got want=$expect")
    }
  }
}
