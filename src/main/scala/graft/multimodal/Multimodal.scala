package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions.
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs, so `decodeStub` derives a deterministic fake feature vector
  * (byte histogram) from the payload. Everything around it is real
  * Spark plumbing: binary column handling, metadata projection,
  * `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas` — per-partition batching, one decoder instance per
  * partition, columnar in/out schema), and frame sampling that
  * restricts work to the bytes actually needed.
  *
  * On a real cluster the stub body is replaced by the codec call; the
  * schema, batching, and partitioning stay as-is.
  */
object Multimodal {

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** Attach a binary payload + typed metadata struct. `srcCol` stands
    * in for raw media bytes (here: utf8 text bytes; in production the
    * binary column arrives from parquet/a blob store as-is).
    */
  def attachPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(
      col(idCol),
      col(srcCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        lit("application/octet-stream").as("mime")))

  /** Content-defined near-dup hash for BINARY payloads: 60-bit simhash
    * over the distinct 4-byte grams of the payload (computed in hex
    * space — two hex chars per byte — so the DuckDB oracle can replay
    * it; DuckDB 1.0 can't slice blobs). Pairs come from
    * [[graft.operators.TextDedup.simhashPairsOf]], the same pigeonhole
    * path as text: near-dup detection for media columns without any
    * codec — byte-level similarity catches re-encodes/truncations of
    * the same source bytes.
    */
  def payloadSimhash(df: DataFrame, idCol: String, binCol: String,
      gramBytes: Int = 4): DataFrame = {
    require(gramBytes >= 1, "gramBytes must be >= 1")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val h = hex(col(binCol))
    val gramLen = 2 * gramBytes
    val grams = array_distinct(
      when(length(h) >= gramLen,
        transform(sequence(lit(1), length(h) - (gramLen - 1)),
          i => h.substr(i, lit(gramLen))))
        .otherwise(array()))
    df.select(
      col(idCol).as("doc_id"),
      graft.functions.GraftFunctions.simhash60Fast(
        graft.functions.GraftFunctions.hash60Array(grams)).as("sh"))
  }

  /** STUB decoder: deterministic 'features' = normalized histogram of
    * payload bytes folded into `dim` buckets. Replace the body with a
    * real codec (e.g., image decode + model embed) in production —
    * signature and plumbing stay identical.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      hist(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < dim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Per-partition batch decode: one decoder "instance" per partition
    * (mirrors mapInPandas batch shape — amortizes model/codec init),
    * typed output schema (id, n_bytes, features array<float>).
    */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val records: Dataset[MediaRecord] = df
      .select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MediaRecord]
    records.mapPartitions { it =>
      // decoder/codec init would happen here, once per partition
      it.map(r => MediaFeatures(r.id, r.payload.length.toLong, decodeStub(r.payload, dim)))
    }.toDF()
  }

  /** STUB resize: normalize payloads to a fixed byte budget —
    * truncate long payloads, zero-pad short ones (a real image resize
    * is a codec call on the same column; the fixed-output-size shape
    * and null/empty handling are the real part). Pure expressions.
    */
  def resizePayload(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame =
    df.withColumn(s"${payloadCol}_resized",
      when(col(payloadCol).isNull, lit(null).cast("binary"))
        .otherwise(expr(
          s"concat(substring($payloadCol, 1, $targetBytes), " +
            s"repeat(cast(x'00' as binary), greatest($targetBytes - length($payloadCol), 0)))")))

  /** Frame sampling: split the payload into `n` even byte-range
    * "frames" (a video decoder would seek keyframes; the chunk
    * arithmetic and explode-to-rows shape is the real part). Pure
    * expressions — no data leaves codegen.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, n: Int): DataFrame = {
    df.select(
      col(idCol),
      col(payloadCol),
      length(col(payloadCol)).cast("long").as("_total"),
      explode(sequence(lit(0L), lit(n.toLong - 1))).as("frame_idx"))
      // integer division (`div`) on both engines; Spark's `/` would be double
      .withColumn("frame_start", expr(s"(frame_idx * _total) div $n + 1"))
      .withColumn("frame_len",
        expr(s"((frame_idx + 1) * _total) div $n - (frame_idx * _total) div $n"))
      .withColumn("frame", expr(s"substring($payloadCol, frame_start, frame_len)"))
      .select(col(idCol), col("frame_idx"), col("frame_len"), col("frame"))
  }
}
