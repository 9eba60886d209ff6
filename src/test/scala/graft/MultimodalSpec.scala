package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"),
    (2L, "abcdefghij"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("attachPayload: binary payload + typed metadata") {
    val df = Multimodal.attachPayload(docs, "doc_id", "text")
    val row = df.filter($"doc_id" === 1).select($"meta.n_bytes", $"meta.sha256").head()
    assert(row.getLong(0) == 11L)
    assert(row.getString(1).length == 64) // sha256 hex
  }

  test("decodeFeatures: deterministic stub features, typed schema, sums to 1") {
    val df = Multimodal.decodeFeatures(
      Multimodal.attachPayload(docs, "doc_id", "text"), "doc_id", "payload", dim = 8)
    assert(df.columns.toSeq == Seq("id", "n_bytes", "features"))
    val Seq(a, b) = Seq(1, 1).map { _ =>
      df.filter($"id" === 1).select($"features").as[Array[Float]].head().toSeq
    }
    assert(a == b)            // deterministic across runs
    assert(a.length == 8)
    assert(math.abs(a.sum - 1.0f) < 1e-5) // normalized histogram
  }

  test("resizePayload: truncates long, zero-pads short, keeps null") {
    val df = Multimodal.resizePayload(
      Multimodal.attachPayload(docs, "doc_id", "text"), "payload", targetBytes = 6)
    val got = df.select($"doc_id", $"payload_resized")
      .as[(Long, Array[Byte])].collect().toMap
    assert(new String(got(1L)) == "hello ")                  // truncated to 6
    assert(got(3L).length == 6 && got(3L).forall(_ == 0))    // empty → all-zero pad
    assert(got(2L).length == 6)
  }

  test("renderPng/decodeImages: real PNG round-trip recovers the closed-form pixels") {
    // the payload really is a PNG (magic bytes), not a fake
    val png = Multimodal.renderPng(7L)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    // decode via the operator; verify against the closed-form channels
    val ids = Seq(0L, 7L, 123L, 100000L).toDF("doc_id")
    val got = Multimodal.decodeImages(
      Multimodal.attachPngPayload(ids, "doc_id"), "id", "payload")
      .as[Multimodal.ImageStats].collect().map(s => s.id -> s).toMap
    for (id <- Seq(0L, 7L, 123L, 100000L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 5).toInt
      var (sr, sg, sb, ws) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (id * 31 + 7L * x + 13L * y) % 256
        val g = (id * 17 + 5L * x + 11L * y) % 256
        val b = (id * 13 + 3L * x + 19L * y) % 256
        sr += r; sg += g; sb += b
        ws += (1L + x + 17L * y) * (r + g + b)
      }
      val s = got(id)
      assert((s.width, s.height, s.sum_r, s.sum_g, s.sum_b, s.wsum) ==
        (w.toLong, h.toLong, sr, sg, sb, ws), s"id=$id")
    }
    // a corrupted payload fails loudly, not silently
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.decodeImages(bad, "doc_id", "payload").collect()
    }
  }

  test("renderWav/decodeAudio: real WAV round-trip recovers the closed-form samples") {
    // the payload really is a RIFF/WAVE container (magic bytes), not a fake
    val wav = Multimodal.renderWav(7L)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString == "WAVE")
    // decode via the operator; verify against the closed-form samples
    val testIds = Seq(0L, 7L, 123L, 100000L)
    val got = Multimodal.decodeAudio(
      Multimodal.attachWavPayload(testIds.toDF("doc_id"), "doc_id"), "id", "payload")
      .as[Multimodal.AudioStats].collect().map(s => s.id -> s).toMap
    for (id <- testIds) {
      val n = (64 + id % 33).toInt
      var (sl, sr, ws) = (0L, 0L, 0L)
      for (i <- 0 until n) {
        val l = (id * 31 + 7L * i) % 4096 - 2048
        val r = (id * 31 + 7L * i + 13) % 4096 - 2048
        sl += l; sr += r
        ws += (1L + i) * (l + r)
      }
      val s = got(id)
      assert((s.n_frames, s.channels, s.sum_l, s.sum_r, s.wsum) ==
        (n.toLong, 2L, sl, sr, ws), s"id=$id")
    }
    // a corrupted payload fails loudly, not silently
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.decodeAudio(bad, "doc_id", "payload").collect()
    }
  }

  test("audio codec stays off the AudioSystem facade (provider-cache invariant)") {
    // The round-14 scale fix: AudioSystem.getAudioInputStream / .write
    // re-walk JDK13Services' SYNCHRONIZED provider scan on every call,
    // serializing all 32 cores on a JVM-global lock (measured 191 s →
    // 14 s at the 100× replica after switching to the per-JVM
    // ServiceLoader cache + direct SPI readers/writer). That fix is
    // load-bearing but value-invisible: a refactor back to the facade
    // passes every round-trip test and silently re-serializes decode.
    // Pin it structurally — a class only names the facade in its
    // constant pool if code references it, so the compiled package
    // must not contain the string at all (comments don't compile in).
    val root = java.nio.file.Paths.get(
      Multimodal.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    val pkgDir = root.resolve("graft/multimodal")
    assert(java.nio.file.Files.isDirectory(pkgDir),
      s"multimodal class dir moved: $pkgDir — re-anchor this pin")
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(pkgDir)
    val offenders =
      try stream.iterator().asScala
        .filter(_.toString.endsWith(".class"))
        .filter { p =>
          new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.ISO_8859_1)
            .contains("javax/sound/sampled/AudioSystem")
        }
        .map(_.getFileName.toString).toList
      finally stream.close()
    assert(offenders.isEmpty,
      s"classes referencing the synchronized AudioSystem facade: $offenders — " +
        "use the cached wavReaders/wavWriter SPI path instead")
  }

  test("renderGif/decodeVideo: real multi-frame GIF round-trip recovers the closed-form voxels") {
    // the payload really is a GIF89a container (magic bytes), not a fake
    val gif = Multimodal.renderGif(7L)
    assert(gif.take(6).map(_.toChar).mkString == "GIF89a")
    val testIds = Seq(0L, 7L, 123L, 100000L)
    val got = Multimodal.decodeVideo(
      Multimodal.attachGifPayload(testIds.toDF("doc_id"), "doc_id"), "id", "payload")
      .as[Multimodal.VideoStats].collect().map(s => s.id -> s).toMap
    for (id <- testIds) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt; val nf = (2 + id % 3).toInt
      var (sr, sg, sb, ws) = (0L, 0L, 0L, 0L)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val c = (id * 31 + 3L * x + 5L * y + 11L * f) % 64
        val r = (id * 5 + 4 * c) % 256
        val g = (id * 3 + 2 * c + 1) % 256
        val b = (id * 7 + 3 * c + 2) % 256
        sr += r; sg += g; sb += b
        ws += (1L + x + 17L * y + 173L * f) * (r + g + b)
      }
      val s = got(id)
      assert((s.n_frames, s.width, s.height, s.sum_r, s.sum_g, s.sum_b, s.wsum) ==
        (nf.toLong, w.toLong, h.toLong, sr, sg, sb, ws), s"id=$id")
    }
    // a corrupted payload fails loudly, not silently
    val bad = Seq((1L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    intercept[Exception] {
      Multimodal.decodeVideo(bad, "doc_id", "payload").collect()
    }
  }

  test("sampleFrames: byte ranges partition the payload exactly") {
    val df = Multimodal.sampleFrames(
      Multimodal.attachPayload(docs.filter($"doc_id" === 2), "doc_id", "text"),
      "doc_id", "payload", n = 4)
    val frames = df.select($"frame_idx", $"frame_len", $"frame")
      .as[(Long, Long, Array[Byte])].collect().sortBy(_._1)
    assert(frames.map(_._2).toSeq == Seq(2L, 3L, 2L, 3L)) // 10 bytes into 4 frames
    assert(frames.flatMap(_._3).map(_.toChar).mkString == "abcdefghij")
  }
}
