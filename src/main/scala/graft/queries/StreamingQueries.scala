package graft.queries

import graft.{Q, Tables}
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators under the cross-engine correctness
  * gate — the reference is batch-only (SURVEY.md §2.9), so these
  * certify the scale-path extension: each query replays the bounded
  * `events` corpus through a real streaming query (file source →
  * stateful transform → memory sink) and the DuckDB oracle states the
  * batch-equivalent SQL. Equality holds because every operator here
  * either emits independently of micro-batch boundaries (update-mode
  * state, inner stream-stream join) or finalizes all real event-time
  * state once a far-future sentinel file advances the watermark (Spark
  * runs a data-less extra micro-batch whenever the watermark advances
  * past pending state — `IncrementalExecution.shouldRunAnotherBatch` —
  * so append aggregates and event-time timeouts drain completely).
  *
  * The feed is `readStream.parquet` over a staged copy of the corpus —
  * the PRODUCTION ingest path, distributed end-to-end with no
  * driver-side data (a MemoryStream feed serializes the corpus into
  * every stage's task binary — ~700 MB at a 100× replica — which is
  * why it is only used in unit specs). All initial files land in the
  * first micro-batch (no maxFilesPerTrigger), so within-batch file
  * order is irrelevant: every stateful fold below sorts by (ts ms,
  * event_id) or is order-insensitive.
  *
  * Determinism contracts (why a streaming run hash-matches batch SQL):
  *  - single data batch: watermark state eviction cannot fire between
  *    rows, and update-mode operators emit each cell exactly once;
  *  - monetary sums ride integer cents (exact in doubles);
  *  - the EWMA replays `0.5*v + 0.5*e` — the identical IEEE op
  *    sequence DuckDB's recursive CTE evaluates, so the trace is
  *    bit-equal even once the dyadic expansion exceeds the mantissa;
  *  - gap/window/timeout arithmetic is millisecond-floor on both
  *    sides (`Timestamp.getTime` ↔ `epoch_ns(ts)//1000000`).
  */
object StreamingQueries {

  private implicit val eventEnc: Encoder[Event] = Encoders.product[Event]

  /** Later than any event time any testdata scale carries (2024), by
    * years — beyond every watermark delay and window, so the
    * sentinel's own state never finalizes and nothing sentinel-derived
    * is ever emitted.
    */
  private val SentinelTs =
    java.sql.Timestamp.from(java.time.Instant.parse("2030-01-01T00:00:00Z"))

  /** Stage a projection to a temp parquet dir that serves as the
    * streaming source. Distributed write, no driver collect.
    */
  private def stage(df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("gq_stream_src").toString
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  /** Events with `value` as integer cents (exact in doubles — the
    * streaming folds stay drift-free and the oracle replays BIGINT).
    */
  private def centsEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", $"ts", $"user_id", $"event_type",
        ($"value" * 100).cast("long").cast("double").as("value"))
  }

  /** Clone the session for the replay: results are state-partition-
    * invariant, but each micro-batch pays store setup/commit PER
    * partition — 8 instead of 32 roughly halves the bounded replay's
    * wall-clock without touching the caller's conf (a cluster run
    * would size this up with the corpus, like any shuffle).
    */
  private def streamSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss
  }

  private def eventStream(s: SparkSession, dir: String): Dataset[Event] =
    s.readStream.schema(eventEnc.schema).parquet(dir).as[Event]

  private def rmdir(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case _: Throwable => () }

  /** Run one bounded streaming replay: the staged corpus arrives as
    * one micro-batch, then (optionally) a sentinel file advances the
    * watermark so event-time state drains in the data-less batch that
    * follows. Returns the memory sink's table.
    */
  private def replay(s: SparkSession, view: String, d: String,
      sentinel: Boolean, mode: String = "append")(
      build: Dataset[Event] => DataFrame): DataFrame = {
    import s.implicits._
    val src = stage(centsEvents(s, d))
    val ss = streamSession(s)
    val q = build(eventStream(ss, src))
      .writeStream.format("memory").queryName(view).outputMode(mode).start()
    try {
      q.processAllAvailable()
      if (sentinel) {
        Seq(Event(-1L, SentinelTs, -1L, "__sentinel", 0.0)).toDS().toDF()
          .write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      rmdir(src)
    }
    ss.table(view)
  }

  val all: Seq[Q] = Seq(

    // streaming tumbling-window aggregation (append mode + watermark):
    // after the sentinel drains state, the emitted set IS the batch
    // hourly rollup — the sentinel's own window never finalizes
    Q.sql(
      "q153_stream_hour_counts",
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS ws_ns,
        |  event_type, count(*) AS cnt,
        |  CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      replay(s, "gq_stream_hour_counts", d, sentinel = true) { ds =>
        EventStream.windowedCounts(ds.toDF(), "10 minutes", "60 minutes")
      }
        .select(
          (unix_micros($"window_start") * 1000L).as("ws_ns"),
          $"event_type", $"cnt", $"total_value".cast("long").as("total_cents"))
        .orderBy($"ws_ns", $"event_type")
    },

    // stateful gap sessionization (flatMapGroupsWithState + event-time
    // timeout): observed gaps close sessions in-batch, the sentinel
    // times out each user's final session → complete batch equality.
    // Gap arithmetic is ms-floor on both sides.
    Q.sql(
      "q154_stream_sessions",
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(trunc(value * 100) AS BIGINT) AS cents,
        |    epoch_ns(ts) AS ns, epoch_ns(ts) // 1000000 AS ms
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
        |        FROM e) t),
        |g AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM b),
        |f AS (
        |  SELECT *, first_value(ns) OVER w AS sns, last_value(ns) OVER w AS ens
        |  FROM g
        |  WINDOW w AS (PARTITION BY user_id, sid ORDER BY ms, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  min(sns) AS start_ns, min(ens) AS end_ns
        |FROM f
        |GROUP BY user_id, sid
        |ORDER BY user_id, start_ns""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      replay(s, "gq_stream_sessions", d, sentinel = true) { ds =>
        EventStream.sessionize(ds, gapMinutes = 30, watermark = "10 minutes").toDF()
      }
        .select($"user_id", $"n_events", $"total_value".cast("long").as("total_cents"),
          (unix_micros($"session_start") * 1000L).as("start_ns"),
          (unix_micros($"session_end") * 1000L).as("end_ns"))
        .orderBy($"user_id", $"start_ns")
    },

    // watermarked stream-stream interval join (view → purchase within
    // 15 min): inner joins emit matches as rows arrive, and a single
    // micro-batch retains all state → the full batch join, no sentinel
    Q.sql(
      "q155_stream_interval_join",
      """SELECT l.user_id AS user_id, l.event_id AS left_id, r.event_id AS right_id,
        |  epoch_ns(l.ts) AS left_ns, epoch_ns(r.ts) AS right_ns
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND epoch_ns(r.ts) >= epoch_ns(l.ts)
        | AND epoch_ns(r.ts) <= epoch_ns(l.ts) + 900000000000
        |WHERE l.event_type = 'view' AND r.event_type = 'purchase'
        |ORDER BY left_id, right_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val ev = centsEvents(s, d)
      val lsrc = stage(ev.filter($"event_type" === "view"))
      val rsrc = stage(ev.filter($"event_type" === "purchase"))
      val ss = streamSession(s)
      val q = EventStream.intervalJoin(
        eventStream(ss, lsrc).toDF(), eventStream(ss, rsrc).toDF(),
        "user_id", within = "15 minutes")
        .writeStream.format("memory").queryName("gq_stream_ijoin")
        .outputMode("append").start()
      try q.processAllAvailable()
      finally { q.stop(); rmdir(lsrc); rmdir(rsrc) }
      ss.table("gq_stream_ijoin")
        .select($"user_id", $"left_id", $"right_id",
          (unix_micros($"left_ts") * 1000L).as("left_ns"),
          (unix_micros($"right_ts") * 1000L).as("right_ns"))
        .orderBy($"left_id", $"right_id")
    },

    // per-window top-K via flatMapGroupsWithState (count-map state,
    // emit-once on event-time timeout): the sentinel finalizes every
    // real window; ties break by key — same contract as the oracle's
    // (cnt DESC, event_type) row_number
    Q.sql(
      "q156_stream_window_topk",
      """WITH c AS (
        |  SELECT (epoch_ns(ts) // 3600000000000) * 3600000000000 AS ws_ns,
        |    event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY ws_ns ORDER BY cnt DESC, event_type) AS rk
        |  FROM c)
        |SELECT ws_ns, event_type, cnt, CAST(rk AS BIGINT) AS rank
        |FROM r WHERE rk <= 3
        |ORDER BY ws_ns, rank""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      replay(s, "gq_stream_topk", d, sentinel = true) { ds =>
        EventStream.windowedTopK(ds, k = 3, windowMinutes = 60).toDF()
      }
        .select((unix_micros($"window_start") * 1000L).as("ws_ns"),
          $"event_type", $"cnt", $"rank".cast("long").as("rank"))
        .orderBy($"ws_ns", $"rank")
    },

    // streaming keep-first dedup bounded by a watermark, projected to
    // its key columns (user, type, hour): within one batch no state is
    // evicted, so the emitted key set is the exact global DISTINCT
    Q.sql(
      "q157_stream_dedup_keys",
      """SELECT DISTINCT user_id, event_type,
        |  epoch_ns(ts) // 3600000000000 AS hour_bucket
        |FROM events
        |ORDER BY user_id, event_type, hour_bucket""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      replay(s, "gq_stream_dedup", d, sentinel = false) { ds =>
        EventStream.dedupWithinWatermark(
          ds.toDF().withColumn("hour_bucket", expr("unix_micros(ts) div 3600000000")),
          Seq("user_id", "event_type", "hour_bucket"), "10 minutes")
          .select("user_id", "event_type", "hour_bucket")
      }
        .orderBy($"user_id", $"event_type", $"hour_bucket")
    },

    // streaming per-key EWMA drift scoring (update-mode state, keyed
    // by type|user): the emitted trace replays 0.5*v + 0.5*e in (ts
    // ms, event_id) order — the identical IEEE sequence the oracle's
    // recursive CTE walks, so the doubles are bit-equal
    Q.sql(
      "q158_stream_drift",
      """WITH RECURSIVE e AS (
        |  SELECT event_type || '|' || CAST(user_id AS VARCHAR) AS drift_key,
        |    event_id, CAST(CAST(trunc(value * 100) AS BIGINT) AS DOUBLE) AS v,
        |    epoch_ns(ts) // 1000000 AS ms
        |  FROM events),
        |o AS (
        |  SELECT drift_key, event_id, v,
        |    row_number() OVER (PARTITION BY drift_key ORDER BY ms, event_id) AS rn
        |  FROM e),
        |r AS (
        |  SELECT drift_key, event_id, v, rn, v AS ewma FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.drift_key, o.event_id, o.v, o.rn, 0.5 * o.v + 0.5 * r.ewma
        |  FROM r JOIN o ON o.drift_key = r.drift_key AND o.rn = r.rn + 1)
        |SELECT drift_key, event_id, CAST(v AS BIGINT) AS value_cents,
        |  ewma, abs(v - ewma) AS drift
        |FROM r
        |ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      replay(s, "gq_stream_drift", d, sentinel = false, mode = "append") { ds =>
        EventStream.driftScores(ds, alpha = 0.5,
          keyOf = e => e.event_type + "|" + e.user_id).toDF()
      }
        .select($"event_type".as("drift_key"), $"event_id",
          $"value".cast("long").as("value_cents"), $"ewma", $"drift")
        .orderBy($"event_id")
    },

    // streaming count-min sketch over the user-id token stream
    // (update-mode cross-batch state): one batch emits each touched
    // cell exactly once — the batch sketch, cell for cell
    Q.sql(
      "q159_stream_cms",
      """WITH toks AS (SELECT CAST(user_id AS VARCHAR) AS tok FROM events),
        |rb AS (
        |  SELECT j, ('0x' || substr(md5(tok || '#' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 64 AS bucket
        |  FROM (SELECT tok, unnest(range(0, 4)) AS j FROM toks))
        |SELECT j AS row_id, bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM rb GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val src = stage(
        Tables.events(s, d).select($"user_id".cast("string").as("tok")))
      val ss = streamSession(s)
      val in = ss.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "tok", org.apache.spark.sql.types.StringType))))
        .parquet(src).as[String]
      val q = EventStream.streamingCountMin(in, rows = 4, width = 64)
        .writeStream.format("memory").queryName("gq_stream_cms")
        .outputMode("update").start()
      try q.processAllAvailable()
      finally { q.stop(); rmdir(src) }
      ss.table("gq_stream_cms").orderBy($"row_id", $"bucket")
    }
  )
}
