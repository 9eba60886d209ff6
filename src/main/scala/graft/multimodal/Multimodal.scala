package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * functions.
  *
  * The IMAGE path runs a REAL codec: [[renderPng]]/[[decodeImages]]
  * encode and decode actual PNG payloads through `javax.imageio`
  * (ships with the JDK — no new dependency). The AUDIO path likewise
  * runs a REAL codec: [[renderWav]]/[[decodeAudio]] encode and decode
  * 16-bit PCM WAV through `javax.sound.sampled` (also JDK-shipped, no
  * audio device needed for stream transcoding). The generic
  * feature-extraction decode (`decodeStub`) and the video path stay
  * stubbed — this container has no video codecs — with a
  * deterministic fake behind the identical plumbing. Everything around
  * either body is real Spark: binary column handling, metadata
  * projection, `mapPartitions` over a typed Dataset (the Scala
  * analogue of `mapInPandas` — per-partition batching, one decoder
  * instance per partition, columnar in/out schema), and frame sampling
  * that restricts work to the bytes actually needed.
  *
  * On a real cluster a stub body is replaced by the codec call — the
  * image path demonstrates exactly that swap; the schema, batching,
  * and partitioning stay as-is.
  */
object Multimodal {

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])
  /** `wsum` is position-weighted — Σ (1 + x + 17·y)·(r+g+b), weight
    * unique per pixel (stride 17 > max width) — so a decoder that
    * mirrors or transposes the raster breaks it even though the plain
    * channel sums would survive.
    */
  final case class ImageStats(id: Long, width: Long, height: Long,
    sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  /** Deterministic PNG test payload for media id `k`: a w×h RGB image
    * (w = 8 + k%9, h = 8 + k%5) whose pixel (x,y) channels are the
    * closed-form (k·31 + 7x + 13y) % 256 / (k·17 + 5x + 11y) % 256 /
    * (k·13 + 3x + 19y) % 256 — so an oracle can predict any pixel
    * statistic arithmetically, WITHOUT a decoder. PNG is lossless:
    * decode must recover these exact values, which is what makes the
    * codec round-trip testable cross-engine.
    */
  def renderPng(id: Long): Array[Byte] = {
    val w = (8 + math.floorMod(id, 9)).toInt
    val h = (8 + math.floorMod(id, 5)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.floorMod(id * 31 + 7L * x + 13L * y, 256).toInt
        val g = math.floorMod(id * 17 + 5L * x + 11L * y, 256).toInt
        val b = math.floorMod(id * 13 + 3L * x + 19L * y, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a REAL PNG payload rendered from the id column — the
    * test-data generator for the image-codec path (production images
    * arrive as a binary parquet column; this stands in for that scan).
    * Per-partition generation, no driver data.
    */
  def attachPngPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no per-stream disk cache
        it.map(id => MediaRecord(id, renderPng(id)))
      }.toDF()
  }

  /** REAL image decode: `javax.imageio` reads each binary PNG/JPEG
    * payload and reduces it to (width, height, per-channel pixel sums)
    * — the same `mapPartitions` batch shape as the stubbed feature
    * decode, with the stub body replaced by the actual codec call.
    * Codec init cost (plugin registry scan) is JVM-wide in ImageIO;
    * the per-partition closure is where a heavier decoder (native lib,
    * model session) would be instantiated once.
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { rec =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          require(img != null, s"undecodable image payload for id=${rec.id}")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb, ws) = (0L, 0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sr += r; sg += g; sb += b
              ws += (1L + x + 17L * y) * (r + g + b)
              x += 1
            }
            y += 1
          }
          ImageStats(rec.id, w.toLong, h.toLong, sr, sg, sb, ws)
        }
      }.toDF()
  }

  /** `wsum` is frame-position-weighted — Σ (1 + i)·(left + right) over
    * frame index i — so a decoder that reorders, drops, or duplicates
    * frames breaks it even though the per-channel sums would survive;
    * the separate left/right sums pin channel INTERLEAVING (a decoder
    * that swaps channels keeps `wsum` but flips `sum_l`/`sum_r`).
    */
  final case class AudioStats(id: Long, n_frames: Long, channels: Long,
    sum_l: Long, sum_r: Long, wsum: Long)

  /** WAV SPI providers resolved ONCE per executor (lazy val): the
    * `AudioSystem` facade re-walks `JDK13Services.getProviders` — a
    * synchronized, non-caching ServiceLoader scan — on EVERY
    * getAudioInputStream/write call, which serializes all tasks on a
    * JVM-global lock (measured: a 5M-payload decode ran at ~1 core on
    * a 32-thread box). Loading the public `javax.sound.sampled.spi`
    * providers ourselves keeps the codec calls lock-free and the path
    * embarrassingly parallel.
    */
  private lazy val wavReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
    // probe ONCE with a minimal PCM WAV and sort the accepting reader
    // first: trying providers blindly per record reaches
    // SoftMidiAudioFileReader, whose rejection probe itself walks
    // MidiSystem.getProviders — the very synchronized JDK13Services
    // scan this cache exists to avoid (measured: 32 tasks BLOCKED on
    // the JSSecurityManager class monitor)
    val probe = renderWav(0L)
    val (hit, miss) = all.partition { r =>
      try { r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close(); true }
      catch { case _: Exception => false }
    }
    hit ++ miss
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider in this JDK"))
  }

  private def openAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    wavReaders.iterator.flatMap { r =>
      try Iterator.single(r.getAudioInputStream(new java.io.ByteArrayInputStream(payload)))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => Iterator.empty }
    }.nextOption().getOrElse(
      throw new IllegalArgumentException("undecodable audio payload"))

  /** Deterministic WAV test payload for media id `k`: 16-bit signed
    * PCM, 2 channels, little-endian, n = 64 + k%33 frames, where frame
    * i channel c carries the closed-form sample
    * ((k·31 + 7i + 13c) mod 4096) − 2048 — so an oracle can predict any
    * sample statistic arithmetically, WITHOUT a decoder. PCM WAV is
    * lossless: decode must recover these exact values, which is what
    * makes the codec round-trip testable cross-engine.
    */
  def renderWav(id: Long): Array[Byte] = {
    val n = (64 + math.floorMod(id, 33)).toInt
    val pcm = new Array[Byte](n * 4) // 2 ch × 2 bytes
    var i = 0
    while (i < n) {
      var c = 0
      while (c < 2) {
        val s = (math.floorMod(id * 31 + 7L * i + 13L * c, 4096) - 2048).toInt
        pcm(4 * i + 2 * c) = (s & 0xff).toByte          // little-endian lo
        pcm(4 * i + 2 * c + 1) = ((s >> 8) & 0xff).toByte // hi
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 2, /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    // direct SPI writer, NOT AudioSystem.write — see wavWriter's note
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Attach a REAL WAV payload rendered from the id column — the
    * test-data generator for the audio-codec path (production audio
    * arrives as a binary parquet column; this stands in for that scan).
    * Per-partition generation, no driver data.
    */
  def attachWavPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(it => it.map(id => MediaRecord(id, renderWav(id))))
      .toDF()
  }

  /** REAL audio decode: `javax.sound.sampled` parses each binary WAV
    * payload (RIFF container + format chunk) and reduces it to
    * (frame count, channel count, per-channel sample sums, a
    * frame-position-weighted sum) — the same `mapPartitions` batch
    * shape as the image decode. The sample layout (width, channel
    * count, endianness, signedness) is read from the DECODED header,
    * not assumed, so a container/codec defect surfaces as a hash
    * mismatch rather than silently re-interpreted bytes.
    */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          // direct SPI readers, NOT AudioSystem.getAudioInputStream —
          // see wavReaders' note (the facade serializes on a global lock)
          val ais =
            try openAudio(rec.payload)
            catch { case e: IllegalArgumentException =>
              throw new IllegalArgumentException(s"${e.getMessage} for id=${rec.id}")
            }
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unexpected sample layout for id=${rec.id}: $fmt")
          val channels = fmt.getChannels
          val bytes = ais.readAllBytes()
          val frameBytes = 2 * channels
          val n = bytes.length / frameBytes
          var (sl, sr, ws) = (0L, 0L, 0L)
          var i = 0
          while (i < n) {
            var frameSum = 0L
            var c = 0
            while (c < channels) {
              val off = i * frameBytes + 2 * c
              val lo = bytes(off) & 0xff
              val hi = bytes(off + 1)
              // header-declared endianness, not an assumption
              val s: Int =
                if (fmt.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                else (hi << 8) | lo
              if (c == 0) sl += s else sr += s
              frameSum += s
              c += 1
            }
            ws += (1L + i) * frameSum
            i += 1
          }
          AudioStats(rec.id, n.toLong, channels.toLong, sl, sr, ws)
        }
      }.toDF()
  }

  /** `wsum` weights every voxel uniquely — Σ (1 + x + 17y + 173f)·
    * (r+g+b) with 17 > max width and 173 > max(x + 17y) — so a decoder
    * that mirrors a raster, reorders frames, or drops/duplicates a
    * frame breaks it even though the plain channel sums would survive.
    */
  final case class VideoStats(id: Long, n_frames: Long, width: Long, height: Long,
    sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  /** Deterministic multi-frame GIF89a test payload for media id `k`:
    * n = 2 + k%3 frames of w×h (w = 4 + k%5, h = 3 + k%4) indexed
    * pixels over a 64-entry id-derived palette — frame f pixel (x,y)
    * carries palette index (k·31 + 3x + 5y + 11f) mod 64, and palette
    * entry c decodes to channels ((k·5 + 4c) mod 256, (k·3 + 2c + 1)
    * mod 256, (k·7 + 3c + 2) mod 256) — so an oracle can predict any
    * frame/pixel statistic arithmetically, WITHOUT a decoder. An
    * indexed GIF is lossless (LZW over palette indices): decode must
    * recover these exact values. Two encoder details matter:
    * TYPE_BYTE_INDEXED with an explicit IndexColorModel (handing the
    * writer RGB makes it quantize to its own web palette — measured
    * lossy), and interlace DISABLED (the JDK's interlaced write does
    * not round-trip row order through its own reader at these sizes —
    * measured: non-first rows come back as palette entry 0).
    */
  def renderGif(id: Long): Array[Byte] = {
    val w = (4 + math.floorMod(id, 5)).toInt
    val h = (3 + math.floorMod(id, 4)).toInt
    val frames = (2 + math.floorMod(id, 3)).toInt
    val (pr, pg, pb) = (new Array[Byte](64), new Array[Byte](64), new Array[Byte](64))
    var c = 0
    while (c < 64) {
      pr(c) = math.floorMod(id * 5 + 4L * c, 256).toByte
      pg(c) = math.floorMod(id * 3 + 2L * c + 1, 256).toByte
      pb(c) = math.floorMod(id * 7 + 3L * c + 2, 256).toByte
      c += 1
    }
    val icm = new java.awt.image.IndexColorModel(8, 64, pr, pg, pb)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val ras = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          ras.setSample(x, y, 0,
            math.floorMod(id * 31 + 3L * x + 5L * y + 11L * f, 64).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Attach a REAL multi-frame GIF payload rendered from the id column
    * — the test-data generator for the video-shaped path (production
    * video arrives as a binary parquet column; this stands in for that
    * scan). Per-partition generation, no driver data.
    */
  def attachGifPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => MediaRecord(id, renderGif(id)))
      }.toDF()
  }

  /** REAL multi-frame decode: `javax.imageio`'s GIF reader parses the
    * GIF89a container (logical screen descriptor, global color table,
    * per-frame image descriptors, LZW-compressed index streams) and
    * reduces every frame to channel sums plus a voxel-weighted sum
    * that pins frame ORDER and raster orientation. This is the
    * video-shaped path: a multi-frame container decoded frame-by-frame
    * — a production deployment swaps the GIF reader for a native
    * H.264/VP9 codec behind the identical mapPartitions plumbing
    * (frame iteration, per-frame stats, typed output schema).
    */
  def decodeVideo(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { rec =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(rec.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"undecodable video payload for id=${rec.id}")
          val reader = readers.next()
          reader.setInput(iis)
          try {
            val n = reader.getNumImages(true)
            var (w, h) = (0, 0)
            var (sr, sg, sb, ws) = (0L, 0L, 0L, 0L)
            var f = 0
            while (f < n) {
              val img = reader.read(f)
              w = img.getWidth; h = img.getHeight
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xff
                  val g = (rgb >> 8) & 0xff
                  val b = rgb & 0xff
                  sr += r; sg += g; sb += b
                  ws += (1L + x + 17L * y + 173L * f) * (r + g + b)
                  x += 1
                }
                y += 1
              }
              f += 1
            }
            VideoStats(rec.id, n.toLong, w.toLong, h.toLong, sr, sg, sb, ws)
          } finally reader.dispose()
        }
      }.toDF()
  }

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
