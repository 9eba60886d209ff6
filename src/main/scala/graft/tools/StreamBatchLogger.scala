package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic listener that prints one stderr line per streaming
  * micro-batch with Spark's own phase timings — the measurement tool
  * behind the replay fixed-cost table in BENCH_NOTES (Round-16).
  *
  * Not active in any normal run: opt in by pointing the standard conf
  * at it, e.g.
  * `JAVA_TOOL_OPTIONS="-Dspark.sql.streaming.streamingQueryListeners=graft.tools.StreamBatchLogger"`
  * — session clones (StreamingQueries.streamSession) inherit the conf,
  * so the gate replays are profiled without touching their code path.
  *
  * Reading the line: `triggerExecution` is the whole batch;
  * `addBatch` is sink + query execution; `walCommit`/`commitOffsets`
  * are the checkpoint fsyncs; `latestOffset`+`getBatch` is source
  * listing. Batch 0 carries the corpus; the final batch is the
  * data-less watermark drain (0 input rows).
  */
class StreamBatchLogger extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    System.err.println(s"[stream-prof] started name=${e.name} at=${System.nanoTime()}")

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val keys = dur.keySet.toArray(Array.empty[String]).sorted
    val parts = keys.map(k => s"$k=${dur.get(k)}").mkString(" ")
    System.err.println(
      s"[stream-prof] name=${p.name} batch=${p.batchId} rows=${p.numInputRows} $parts")
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    System.err.println(s"[stream-prof] terminated at=${System.nanoTime()}")
}
