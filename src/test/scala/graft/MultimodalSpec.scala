package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaRecord, Multimodal}

/** WAV/RIFF audio metadata: the encoder/parser pair must round-trip the
  * exact synthesis parameters via a genuine chunk WALK (the fixture embeds
  * a junk LIST chunk between fmt and data, so a canonical-44-byte-offset
  * reader would mis-parse), and reject non-WAV payloads rather than
  * fabricate metadata.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("WAV round-trip recovers rate/channels/samples/duration exactly") {
    for ((sr, ch, n) <- Seq((8000, 1, 400), (44100, 2, 1234), (22050, 1, 7),
        (16000, 2, 999))) {
      val bytes = Multimodal.encodeWav(sr, ch, n, seed = sr + n)
      val got = Multimodal.decodeWavMeta(bytes)
      assert(got.contains((sr, ch, n.toLong, n * 1000L / sr)),
        s"($sr,$ch,$n) -> $got")
    }
  }

  test("odd-sized junk chunk is padded per RIFF and the walk survives it") {
    // encodeWav's LIST junk is 11 bytes (odd) — the parser must skip the
    // pad byte or every later chunk is off by one
    val bytes = Multimodal.encodeWav(8000, 1, 10, seed = 3)
    assert(Multimodal.decodeWavMeta(bytes).contains((8000, 1, 10L, 1L)))
  }

  test("non-WAV and truncated payloads yield None, never garbage") {
    assert(Multimodal.decodeWavMeta("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWavMeta(Array.emptyByteArray).isEmpty)
    val wav = Multimodal.encodeWav(8000, 1, 100, seed = 1)
    assert(Multimodal.decodeWavMeta(wav.take(40)).isEmpty) // header cut short
    // corrupt the WAVE tag: RIFF but not WAV
    val notWave = wav.clone(); notWave(8) = 'X'
    assert(Multimodal.decodeWavMeta(notWave).isEmpty)
  }

  test("truncated data chunk: duration reflects present bytes, not the header") {
    val wav = Multimodal.encodeWav(8000, 1, 1000, seed = 2) // declares 2000 data bytes
    val cut = wav.take(wav.length - 1000) // drop 500 samples' worth
    val got = Multimodal.decodeWavMeta(cut)
    assert(got.contains((8000, 1, 500L, 62L)), got.toString)
  }

  test("decodeOne uses the real WAV duration for audio payloads") {
    val wav = Multimodal.encodeWav(16000, 2, 8000, seed = 9) // 500 ms
    val f = Multimodal.decodeOne(MediaRecord(1L, "audio", wav, Map.empty))
    assert(f.duration_ms == 500L)
    // non-WAV audio payload falls back to the documented n_bytes stub
    val stub = Multimodal.decodeOne(
      MediaRecord(2L, "audio", Array.fill[Byte](123)(7), Map.empty))
    assert(stub.duration_ms == 123L)
  }

  test("MP4 round-trip recovers timescale/duration/dims/frames exactly") {
    for ((ts, dur, w, h, nf) <- Seq((600, 3000L, 640, 360, 75L),
        (90000, 90000L, 1920, 1080, 24L), (1000, 1L, 16, 16, 1L),
        (12288, 999999L, 1280, 720, 1000L))) {
      val bytes = Multimodal.encodeMp4(ts, dur, w, h, nf, seed = ts + nf.toInt)
      val got = Multimodal.decodeMp4Meta(bytes)
      assert(got.isDefined, s"($ts,$dur,$w,$h,$nf) failed to parse")
      val m = got.get
      assert((m.timescale, m.durationUnits, m.width, m.height, m.nFrames) ==
        (ts.toLong, dur, w, h, nf))
      assert(m.durationMs == dur * 1000L / ts)
    }
  }

  test("MP4 frame pts follows the two stts runs (100 then 120 units)") {
    val m = Multimodal.decodeMp4Meta(
      Multimodal.encodeMp4(1000, 5000L, 320, 240, 9L, seed = 4)).get
    // runs: 5 frames at delta 100, then 4 at delta 120
    assert(m.stts == Seq((5L, 100L), (4L, 120L)))
    assert(m.framePtsUnits(0) == 0L)
    assert(m.framePtsUnits(4) == 400L)
    assert(m.framePtsUnits(5) == 500L)   // first frame of run 2
    assert(m.framePtsUnits(8) == 500L + 3 * 120L)
    assert(m.framePtsMs(8) == (500L + 360L) * 1000L / 1000L)
  }

  test("MP4 junk free boxes defeat fixed-offset readers; walk survives") {
    // the encoder interleaves free boxes before moov, mvhd and stts whose
    // lengths vary with the seed — parse across several seeds
    for (seed <- 0 until 8) {
      val got = Multimodal.decodeMp4Meta(
        Multimodal.encodeMp4(600, 1200L, 100, 50, 10L, seed))
      assert(got.exists(m => m.width == 100 && m.height == 50 && m.nFrames == 10L),
        s"seed $seed -> $got")
    }
  }

  test("MP4 round-trip property: 200 random parameter tuples all recover") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (_ <- 0 until 200) {
      val ts = 1 + rnd.nextInt(100000)
      val dur = rnd.nextLong(1L << 31)
      val w = rnd.nextInt(4096); val h = rnd.nextInt(4096)
      val nf = rnd.nextLong(100000L)
      val m = Multimodal.decodeMp4Meta(
        Multimodal.encodeMp4(ts, dur, w, h, nf, rnd.nextInt())).get
      assert((m.timescale, m.durationUnits, m.width, m.height, m.nFrames) ==
        (ts.toLong, dur, w, h, nf))
      assert(m.durationMs == dur * 1000L / ts)
      if (nf > 0) {
        val i = rnd.nextLong(nf)
        val run1 = (nf + 1) / 2
        val expect = if (i < run1) i * 100L else run1 * 100L + (i - run1) * 120L
        assert(m.framePtsUnits(i) == expect)
      }
    }
  }

  test("non-MP4 and malformed payloads yield None, never garbage") {
    assert(Multimodal.decodeMp4Meta("not video at all".getBytes).isEmpty)
    assert(Multimodal.decodeMp4Meta(Array.emptyByteArray).isEmpty)
    val mp4 = Multimodal.encodeMp4(600, 600L, 64, 64, 5L, seed = 1)
    assert(Multimodal.decodeMp4Meta(mp4.take(20)).isEmpty) // moov cut off
    val notFtyp = mp4.clone(); notFtyp(4) = 'X'
    assert(Multimodal.decodeMp4Meta(notFtyp).isEmpty)
  }

  test("MP4 empty mvhd/tkhd boxes yield None, not an index exception") {
    // ftyp + moov whose mvhd box is header-only (size 8, no payload): the
    // version byte must not be read past the box end
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isom0000".getBytes)
    val emptyMvhd = Array.concat(ftyp, box("moov", box("mvhd", Array.emptyByteArray)))
    assert(Multimodal.decodeMp4Meta(emptyMvhd).isEmpty)
    val mvhd100 = box("mvhd", Array.fill[Byte](100)(0))
    val emptyTkhd = Array.concat(ftyp,
      box("moov", Array.concat(mvhd100, box("trak", box("tkhd", Array.emptyByteArray)))))
    // mvhd with timescale 0 also rejects; patch a nonzero timescale in
    val withTs = emptyTkhd.clone()
    // timescale lives 12 bytes into mvhd payload; mvhd payload starts at
    // ftyp(16) + moov header(8) + mvhd header(8)
    withTs(16 + 8 + 8 + 12 + 3) = 1
    assert(Multimodal.decodeMp4Meta(withTs).isEmpty)
  }

  test("MP4 truncated stts clamps to present runs (no declared-count trust)") {
    val mp4 = Multimodal.encodeMp4(1000, 5000L, 320, 240, 9L, seed = 2)
    // cut mid-way through the second stts run entry (mdat trails stts, so
    // chop from the end until the stts payload loses its last 8 bytes)
    val cut = mp4.take(mp4.length - (48 + (2 & 31)) - 8 - 8)
    val got = Multimodal.decodeMp4Meta(cut)
    assert(got.exists(_.stts == Seq((5L, 100L))), got.toString)
  }

  test("decodeOne uses the real MP4 dims and duration for video payloads") {
    val mp4 = Multimodal.encodeMp4(600, 1500L, 640, 360, 60L, seed = 9)
    val f = Multimodal.decodeOne(MediaRecord(1L, "video", mp4, Map.empty))
    assert(f.width == 640 && f.height == 360 && f.duration_ms == 2500L)
    // non-MP4 video payload falls back to the documented n_bytes stub
    val stub = Multimodal.decodeOne(
      MediaRecord(2L, "video", Array.fill[Byte](77)(7), Map.empty))
    assert(stub.duration_ms == 77L)
  }

  test("sampleFramesMp4: every Nth frame with run-accurate pts, dropped if unparseable") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "video", Multimodal.encodeMp4(1000, 5000L, 320, 240, 25L, 3), Map.empty),
      MediaRecord(2L, "video", "junk".getBytes, Map.empty)))
    val rows = Multimodal.sampleFramesMp4(media, everyNthFrame = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    // runs: 13 at 100, 12 at 120; frame 20 pts = 1300 + 7*120 = 2140
    assert(rows.toSeq == Seq((1L, 0L, 0L), (1L, 10L, 1000L), (1L, 20L, 2140L)))
  }

  test("imageDHash recovers the planted pattern from real pixels at every cell scale") {
    // the fixture encodes the pattern into REAL pixel gray levels; equality
    // across cell scales 1-4 proves the hash comes from box-averaged decoded
    // pixels (a header read has no dims-independent bit source, and the
    // zero-sum ±3 dither inside each block defeats single-pixel sampling)
    for (id <- Seq(0L, 1L, 7L, 12L, 501L, 99999L); cell <- 1 to 4) {
      val p = Multimodal.dHashPatternOf(id)
      val got = Multimodal.imageDHash(Multimodal.encodeDHashPng(p, cell))
      assert(got.contains(p), s"id=$id cell=$cell")
    }
  }

  test("one planted bit flip moves exactly one dHash bit") {
    val base = Multimodal.dHashPatternOf(42L)
    for (bit <- Seq(0, 17, 33, 63)) {
      val h = Multimodal.imageDHash(
        Multimodal.encodeDHashPng(base ^ (1L << bit), cell = 2)).get
      assert(java.lang.Long.bitCount(h ^ base) == 1 && ((h >>> bit) & 1L) != ((base >>> bit) & 1L),
        s"bit=$bit")
    }
  }

  test("dHash survives a real bilinear resize (perceptual robustness)") {
    import spark.implicits._
    // encode at 18x16 (cell=2), resize through the REAL Graphics2D path to
    // 27x24 and 9x8: the gradient-sign structure must survive interpolation
    val p = Multimodal.dHashPatternOf(7L)
    val png = Multimodal.encodeDHashPng(p, cell = 2)
    for ((w, h) <- Seq((27, 24), (9, 8))) {
      val resized = Multimodal.resize(
        spark.createDataset(Seq(MediaRecord(1L, "image", png, Map.empty))), w, h)
        .collect().head.bytes
      val rh = Multimodal.imageDHash(resized).get
      assert(java.lang.Long.bitCount(rh ^ p) <= 4,
        s"${w}x$h drifted ${java.lang.Long.bitCount(rh ^ p)} bits")
    }
  }

  test("planted near-dups: blocked pair join equals the all-pairs answer") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 3 groups of 8: every pair's hamming is a pure function of the planted
    // flip masks; the pigeonhole-blocked plan must equal brute force at <= 3
    val ids = (0L until 24L)
    val sk = ids.map(id => (id, Multimodal.imageDHash(Multimodal.encodeDHashPng(
      Multimodal.dHashPatternOf(id), cell = 1 + (id % 3).toInt)).get))
    val expected = (for {
      (a, ha) <- sk; (b, hb) <- sk if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).sorted
    assert(expected.nonEmpty && expected.exists(_._3 == 0L) &&
      expected.exists(_._3 == 3L)) // fixture plants the full 0-3 range
    assert(expected.forall { case (a, b, _) => a / 8 == b / 8 },
      "cross-group pairs must sit at ~32 bits, far beyond the threshold")
    val got = graft.operators.Dedup.hamming64Pairs(
        sk.toDF("doc_id", "sk"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == expected)
  }

  test("audioDHash recovers the planted pattern from real PCM at every window width") {
    for (id <- Seq(0L, 3L, 8L, 777L); fpw <- Seq(2, 4, 6, 8)) {
      val p = Multimodal.dHashPatternOf(id)
      val got = Multimodal.audioDHash(Multimodal.encodeEnergyWav(p, fpw))
      assert(got.contains(p), s"id=$id framesPerWin=$fpw")
    }
  }

  test("audioDHash sums real samples: one flipped pattern bit moves one hash bit") {
    val base = Multimodal.dHashPatternOf(9L)
    for (bit <- Seq(0, 31, 32, 63)) {
      val h = Multimodal.audioDHash(
        Multimodal.encodeEnergyWav(base ^ (1L << bit), framesPerWin = 4)).get
      assert(java.lang.Long.bitCount(h ^ base) == 1 &&
        ((h >>> bit) & 1L) != ((base >>> bit) & 1L), s"bit=$bit")
    }
  }

  test("audioDHash rejects non-audio and sub-window payloads") {
    assert(Multimodal.audioDHash("junk".getBytes).isEmpty)
    // 32 samples < 65 windows
    assert(Multimodal.audioDHash(Multimodal.encodeWav(8000, 1, 32, 5)).isEmpty)
    assert(Multimodal.audioDHash(Multimodal.encodeWav(8000, 1, 200, 5)).nonEmpty)
  }

  test("malformed RIFF chunk sizes terminate the walk instead of hanging") {
    // a chunk whose LE u32 size is 0xFFFFFFF8 used to wrap size.toInt to -8,
    // stalling `off` forever (executor-task hang); 0x80000000 drove off
    // negative and threw out of the None-contract
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0x7FFFFFFFL)) {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("JUNK".getBytes("US-ASCII")).putInt(sz.toInt) // lying size
      val bytes = b.array()
      assert(Multimodal.decodeWavMeta(bytes).isEmpty)
      assert(Multimodal.wavPcm16Samples(bytes).isEmpty)
      assert(Multimodal.audioDHash(bytes).isEmpty)
    }
  }

  test("fracGt compares exactly where the raw product would wrap") {
    // a*b = 2^62+..., c*d slightly smaller: both overflow a signed 64-bit
    // product if multiplied naively after doubling — force the BigInt path
    val big = 3037000500L // ~2^31.5, big*big ~ 2^63.0
    assert(Multimodal.fracGt(big, big, big - 1, big))
    assert(!Multimodal.fracGt(big - 1, big, big, big))
    assert(!Multimodal.fracGt(big, big, big, big)) // equal -> not greater
    // fast path still exact
    assert(Multimodal.fracGt(3, 5, 7, 2) && !Multimodal.fracGt(7, 2, 3, 5))
  }

  test("wavPcm16Samples round-trips samples through the chunk walk") {
    val pcm = Multimodal.wavPcm16Samples(Multimodal.encodeWav(8000, 2, 50, 9))
    assert(pcm.exists(_.length == 100)) // 50 frames x 2 channels
    // values match the encoder's seeded formula
    val want = (0 until 100).map(i => ((9 + i * 2654435761L) & 0xFFFF).toShort)
    assert(pcm.get.toSeq == want)
  }

  test("videoTimingHash recovers the planted pattern from real stts runs") {
    for (id <- Seq(0L, 5L, 13L, 4321L)) {
      val p = Multimodal.dHashPatternOf(id)
      val got = Multimodal.videoTimingHash(
        Multimodal.encodeTimingMp4(p, seed = id.toInt))
      assert(got.contains(p), s"id=$id")
    }
  }

  test("videoTimingHash expands runs, not one field: multi-frame runs collapse bits") {
    // 65 frames as 5 runs of 13 equal durations: all intra-run deltas are 0
    // (bit=0) and only the 4 run boundaries can set bits — a parser reading
    // a single stts entry could not produce this shape
    val mp4 = Multimodal.encodeMp4WithStts(30000, 64, 48,
      stts = Seq((13L, 100L), (13L, 200L), (13L, 150L), (13L, 300L), (13L, 50L)),
      seed = 3)
    val h = Multimodal.videoTimingHash(mp4).get
    // boundaries after frames 13,26,39,52 -> bit indices 12 (100<200),
    // 38 (150<300); down-steps at 25, 51 stay 0
    assert(h == ((1L << 12) | (1L << 38)), s"got ${h.toBinaryString}")
  }

  test("videoTimingHash rejects non-video and short clips") {
    assert(Multimodal.videoTimingHash("junk".getBytes).isEmpty)
    assert(Multimodal.videoTimingHash(
      Multimodal.encodeMp4(30000, 1000, 64, 48, nFrames = 64, seed = 1)).isEmpty)
    assert(Multimodal.videoTimingHash(
      Multimodal.encodeMp4(30000, 1000, 64, 48, nFrames = 65, seed = 1)).nonEmpty)
  }

  test("imageDHash rejects non-images and sub-grid images") {
    assert(Multimodal.imageDHash("junk".getBytes).isEmpty)
    assert(Multimodal.imageDHash(Multimodal.encodePng(8, 8, 1)).isEmpty) // w < 9
    assert(Multimodal.imageDHash(Multimodal.encodePng(9, 8, 1)).nonEmpty)
  }

  test("audioMeta Dataset path: per-row recovery, non-WAV rows dropped") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "audio", Multimodal.encodeWav(8000, 1, 800, 5), Map.empty),
      MediaRecord(2L, "audio", "junk".getBytes, Map.empty),
      MediaRecord(3L, "audio", Multimodal.encodeWav(44100, 2, 441, 6), Map.empty)))
    val rows = Multimodal.audioMeta(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 8000L, 1L, 800L, 100L),
      (3L, 44100L, 2L, 441L, 10L)))
  }
}
