package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media asset: opaque payload + typed metadata. At 100 TB the payload
  * column stays opaque binary in parquet (no re-encode); metadata is columnar
  * and prunable so scans that only need dimensions never touch bytes.
  */
final case class MediaRecord(
    media_id: Long,
    kind: String, // "image" | "audio" | "video"
    bytes: Array[Byte],
    meta: Map[String, String])

/** Extracted features — fixed schema so downstream joins are columnar. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    head_hash: Long,
    width: Int,
    height: Int,
    duration_ms: Long)

/** Multimodal column plumbing: decode / feature-extract / frame-sample over
  * opaque binary columns.
  *
  * IMAGE decode is REAL as of round 7: payloads carrying a PNG or JPEG magic
  * prefix are dimension-decoded through JDK `javax.imageio` (no new
  * dependency — see [[decodeImageDims]]). AUDIO metadata is REAL as of
  * round 8: WAV/RIFF payloads are parsed by a manual chunk walk
  * ([[decodeWavMeta]]) recovering sample rate / channels / duration from
  * the headers. VIDEO metadata is REAL as of round 8: MP4/ISO-BMFF
  * payloads are parsed by a manual box walk ([[decodeMp4Meta]]) recovering
  * timescale / duration / dimensions / frame count from the moov header
  * boxes. Payloads with no recognized container (neither PNG/JPEG magic,
  * RIFF/WAVE, nor an ftyp box) fall back to the deterministic stub in
  * `decodeOne` (documented below) so opaque bytes still flow. The
  * Spark-side plumbing is the same either way: typed Dataset in/out,
  * per-partition batch processing (the Scala analogue of `mapInPandas`
  * batches), explicit repartition control so huge payload rows spread
  * evenly, and metadata-only fast paths that never deserialize bytes.
  */
object Multimodal extends Serializable {

  // ImageIO must never touch a display server; executors run headless.
  System.setProperty("java.awt.headless", "true")

  // Per-thread reader/writer instances: ImageIO.getImageReaders /
  // ImageIO.write walk the service-provider registry on EVERY call, and
  // those lookups synchronize — measured as cross-thread stalls when 32
  // executor threads decode/encode concurrently (q129/q130). Readers and
  // writers are not thread-safe but are reusable, so one instance per
  // (thread, format) amortizes the registry walk away. Never disposed:
  // bounded by thread count × 2 formats.
  private val readerTL: ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, javax.imageio.ImageReader]())
  private def cachedReader(fmt: String): javax.imageio.ImageReader = {
    val m = readerTL.get()
    var r = m.get(fmt)
    if (r == null) {
      r = javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
      m.put(fmt, r)
    }
    r
  }
  private val pngWriterTL: ThreadLocal[javax.imageio.ImageWriter] =
    ThreadLocal.withInitial(() =>
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next())

  /** Exact a·b > c·d over non-negative longs, overflow-safe: the fast path
    * multiplies when both products provably fit; otherwise the comparison
    * runs in BigInt (cold — only multi-hour audio / gigapixel images get
    * there). The silent-wraparound alternative flips fingerprint bits once
    * window energy × window size crosses 2⁶³ — ~1.1e9 samples (≈ 3.4 h of
    * 44.1 kHz stereo), an ordinary long asset in a media corpus.
    */
  private[graft] def fracGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val fits = (b == 0 || a <= Long.MaxValue / math.max(b, 1L)) &&
      (d == 0 || c <= Long.MaxValue / math.max(d, 1L))
    if (fits) a * b > c * d
    else BigInt(a) * BigInt(b) > BigInt(c) * BigInt(d)
  }

  /** Real image dimension decode via JDK ImageIO (PNG/JPEG). Header-only:
    * `ImageReader.getWidth/getHeight` parse the IHDR chunk / SOF marker and
    * never the pixel data, so this is O(header) per asset — the shape that
    * survives 100 TB of media (full-pixel decode would be the scale killer,
    * and nothing downstream of dimensions needs it). Only attempted when the
    * payload carries a PNG/JPEG magic prefix: a lax ImageIO reader (BMP
    * accepts any "BM" prefix) fed arbitrary bytes can return garbage dims
    * instead of throwing, which would silently diverge from the stub oracle.
    */
  def decodeImageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    val isPng = bytes.length > 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'
    val isJpeg = bytes.length > 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF
    if (!isPng && !isJpeg) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val r = cachedReader(if (isPng) "png" else "jpeg")
        r.setInput(iis)
        try Some((r.getWidth(0), r.getHeight(0)))
        finally r.reset() // drop the stream ref; keep the reader instance
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic PNG encoder (test/fixture helper): a w×h image whose
    * pixels are a stable function of `seed`. Used by q129's round-trip gate —
    * the engine encodes, [[decodeOne]] decodes, the oracle predicts the
    * dimensions arithmetically.
    */
  def encodePng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (seed + x * 31 + y * 131) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** PNG-encode via the per-thread cached writer (no registry walk). */
  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val w = pngWriterTL.get()
    try {
      w.setOutput(ios)
      w.write(img)
    } finally { w.reset(); ios.close() }
    bos.toByteArray
  }

  /** Real audio metadata from a WAV/RIFF payload, header-only: a manual
    * RIFF chunk walk (public file-format knowledge, pure JDK byte reads — no
    * codec dependency) recovering (sample_rate, channels, n_samples,
    * duration_ms) from the `fmt ` and `data` chunk HEADERS. The data chunk's
    * samples are never touched — only its declared size — so this is
    * O(header) per asset like [[decodeImageDims]]: the only decode shape
    * that survives 100 TB of media. Returns None unless the payload starts
    * with RIFF....WAVE and carries a parseable PCM `fmt ` chunk.
    *
    * duration_ms = n_samples · 1000 / sample_rate in truncating integer
    * division — both engine and oracle must use the same integral divide
    * (no doubles; the IntRatio lesson applies to any hashed derived value).
    */
  def decodeWavMeta(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate = -1; var channels = -1; var bitsPerSample = -1
    var dataSize = -1L
    // chunk walk: 4CC + LE u32 size, then the payload, padded to even length
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataSize < 0)) {
      val id = tag(off); val size = u32(off + 4)
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length) {
        val audioFormat = u16(off + 8)
        if (audioFormat != 1) return None // PCM only
        channels = u16(off + 10)
        sampleRate = u32(off + 12).toInt
        bitsPerSample = u16(off + 22)
      } else if (id == "data") {
        // clamp to the bytes actually present: a truncated file (or lying
        // header) must not inflate the duration past the real payload
        dataSize = math.max(0L, math.min(size, (bytes.length - off - 8).toLong))
      }
      // Long-domain step with a hard floor: a malformed/adversarial chunk
      // size near 2^32 would wrap size.toInt negative — off would stall
      // (infinite loop) or go negative (throw) inside an executor task.
      // Any chunk reaching past the payload ends the walk (truncated-file
      // clamping above has already recorded what is recoverable).
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > bytes.length || next <= off) bytes.length else next.toInt
    }
    if (sampleRate <= 0 || channels <= 0 || bitsPerSample <= 0 || dataSize < 0)
      None
    else {
      val bytesPerFrame = channels * (bitsPerSample / 8)
      if (bytesPerFrame <= 0) None
      else {
        val nSamples = dataSize / bytesPerFrame
        Some((sampleRate, channels, nSamples, nSamples * 1000L / sampleRate))
      }
    }
  }

  /** Deterministic 16-bit PCM WAV encoder (test/fixture helper, the audio
    * twin of [[encodePng]]): `nSamples` frames of `channels`-channel audio
    * whose samples are a stable function of `seed`. A junk `LIST` chunk is
    * deliberately placed between `fmt ` and `data` so a parser that assumes
    * the canonical 44-byte layout (data at offset 36) fails — the round-trip
    * gate then genuinely proves the chunk WALK, not a fixed-offset read.
    */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int,
      seed: Int): Array[Byte] = {
    val junk = Array.tabulate[Byte](11)(i => ((seed + i) & 0x7F).toByte)
    val junkPadded = junk.length + (junk.length & 1)
    val dataSize = nSamples * channels * 2
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16.toShort)              // bits per sample
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    if ((junk.length & 1) == 1) buf.put(0.toByte) // RIFF even-size padding
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples * channels) {
      buf.putShort(((seed + i * 2654435761L) & 0xFFFF).toShort)
      i += 1
    }
    buf.array()
  }

  /** Audio metadata extraction over a media Dataset: one row per decodable
    * WAV payload with (media_id, sample_rate, channels, n_samples,
    * duration_ms) — the audio analogue of the q129 image-dimension path.
    * Header-only per [[decodeWavMeta]]; non-WAV payloads are dropped (the
    * caller's curation filter decides what undecodable assets mean).
    */
  def audioMeta(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      decodeWavMeta(r.bytes).map { case (sr, ch, n, ms) =>
        (r.media_id, sr.toLong, ch.toLong, n, ms)
      }
    }.toDF("media_id", "sample_rate", "channels", "n_samples", "duration_ms")
  }

  /** Parsed MP4/ISO-BMFF header metadata. `stts` is the decoded
    * time-to-sample table: (sample_count, sample_delta) runs in declaration
    * order — `nFrames` and per-frame presentation times derive from it
    * without ever touching sample payloads.
    */
  final case class Mp4Meta(
      timescale: Long, durationUnits: Long, width: Int, height: Int,
      stts: Seq[(Long, Long)]) {
    def nFrames: Long = stts.iterator.map(_._1).sum
    /** Truncating integer division — no doubles in a hashed column. */
    def durationMs: Long = durationUnits * 1000L / timescale
    /** Presentation time of frame `i` in timescale units: the prefix sum of
      * stts deltas, O(runs) not O(frames).
      */
    def framePtsUnits(i: Long): Long = {
      var left = i; var pts = 0L
      stts.foreach { case (cnt, delta) =>
        val take = math.min(left, cnt)
        pts += take * delta
        left -= take
      }
      pts
    }
    def framePtsMs(i: Long): Long = framePtsUnits(i) * 1000L / timescale
  }

  /** Real video metadata from an MP4/ISO-BMFF payload, header-only: a
    * manual box walk (public file-format knowledge, pure JDK byte reads — no
    * codec dependency) recovering movie timescale + duration from
    * `moov/mvhd`, track pixel dimensions from `moov/trak/tkhd` (stored as
    * 16.16 fixed-point), and the frame count from the
    * `moov/trak/mdia/minf/stbl/stts` time-to-sample runs. The `mdat` box —
    * which is ~100% of a real video's bytes — is never entered: like
    * [[decodeImageDims]] and [[decodeWavMeta]] this is O(header) per asset,
    * the only decode shape that survives 100 TB of media. Returns None
    * unless the payload leads with an `ftyp` box and carries parseable
    * mvhd + tkhd boxes. Handles 32-bit, 64-bit (`size==1` + largesize) and
    * to-end-of-file (`size==0`) box sizes, and both version-0 and
    * version-1 mvhd/tkhd layouts.
    */
  def decodeMp4Meta(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32(o: Int): Long = ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
      ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    // first `id` child box in [start, end): (payloadStart, boxEnd)
    def findChild(start: Int, end: Int, id: String): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(off); val typ = tag(off + 4)
        var payloadStart = off + 8
        var boxSize = size
        if (size == 1L) {
          if (off + 16 > end) return None
          boxSize = u64(off + 8); payloadStart = off + 16
        } else if (size == 0L) boxSize = (end - off).toLong
        if (boxSize < (payloadStart - off).toLong) return None // malformed
        val boxEnd = off + math.min(boxSize, (end - off).toLong).toInt
        if (typ == id) return Some((payloadStart, boxEnd))
        off = boxEnd
      }
      None
    }
    if (bytes.length < 16 || tag(4) != "ftyp") return None
    for {
      (moovS, moovE) <- findChild(0, bytes.length, "moov")
      (mvhdS, mvhdE) <- findChild(moovS, moovE, "mvhd")
      if mvhdE - mvhdS >= 20 // guard BEFORE reading the version byte
      mvhdVer = bytes(mvhdS) & 0xFF
      // v0: ver/flags(4) creation(4) mod(4) timescale(4) duration(4)
      // v1: ver/flags(4) creation(8) mod(8) timescale(4) duration(8)
      if mvhdVer != 1 || mvhdE - mvhdS >= 32
      timescale = if (mvhdVer == 1) u32(mvhdS + 20) else u32(mvhdS + 12)
      if timescale > 0
      duration = if (mvhdVer == 1) u64(mvhdS + 24) else u32(mvhdS + 16)
      (trakS, trakE) <- findChild(moovS, moovE, "trak")
      (tkhdS, tkhdE) <- findChild(trakS, trakE, "tkhd")
      if tkhdE > tkhdS // guard BEFORE reading the version byte
      tkhdVer = bytes(tkhdS) & 0xFF
      // width's payload offset: v0 = 4+4+4+4+4+4+8+2+2+2+2+36 = 76;
      // v1's 64-bit creation/modification/duration add 12 → 88
      wOff = if (tkhdVer == 1) 88 else 76
      if tkhdE - tkhdS >= wOff + 8
    } yield {
      val w = (u32(tkhdS + wOff) >> 16).toInt // 16.16 fixed-point
      val h = (u32(tkhdS + wOff + 4) >> 16).toInt
      val stts = (for {
        (mdiaS, mdiaE) <- findChild(trakS, trakE, "mdia")
        (minfS, minfE) <- findChild(mdiaS, mdiaE, "minf")
        (stblS, stblE) <- findChild(minfS, minfE, "stbl")
        (sttsS, sttsE) <- findChild(stblS, stblE, "stts")
        if sttsE - sttsS >= 8
      } yield {
        val declared = u32(sttsS + 4)
        // clamp to entries actually present (truncated-file lesson, WAV parity)
        val present = math.min(declared, ((sttsE - sttsS - 8) / 8).toLong).toInt
        (0 until present).map(i =>
          (u32(sttsS + 8 + i * 8), u32(sttsS + 12 + i * 8)))
      }).getOrElse(Seq.empty)
      Mp4Meta(timescale, duration, w, h, stts)
    }
  }

  /** Deterministic minimal MP4 encoder (test/fixture helper, the video twin
    * of [[encodePng]]/[[encodeWav]]): ftyp + moov{mvhd, trak{tkhd,
    * mdia{minf{stbl{stts}}}}} + mdat with seeded payload bytes. Junk `free`
    * boxes are deliberately interleaved before moov, before mvhd and before
    * stts so a parser assuming canonical box offsets fails — the round-trip
    * gate then genuinely proves the box WALK. The stts table is emitted as
    * TWO runs with different deltas, so recovering `nFrames` proves run
    * summation, not a single-field read.
    */
  def encodeMp4(timescale: Int, durationUnits: Long, w: Int, h: Int,
      nFrames: Long, seed: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val total = 8 + payload.iterator.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(total) // big-endian by default
      buf.putInt(total).put(typ.getBytes("US-ASCII"))
      payload.foreach(buf.put)
      buf.array()
    }
    def payload(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n); f(b); b.array()
    }
    def junk(salt: Int): Array[Byte] = box("free",
      Array.tabulate[Byte](5 + ((seed + salt) & 7))(i => ((seed + salt * 31 + i) & 0x7F).toByte))
    def identityMatrix(b: java.nio.ByteBuffer): Unit = {
      b.putInt(0x00010000); b.putInt(0); b.putInt(0)
      b.putInt(0); b.putInt(0x00010000); b.putInt(0)
      b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    }
    val ftyp = box("ftyp", payload(8) { b =>
      b.put("isom".getBytes("US-ASCII")); b.putInt(512)
    })
    val mvhd = box("mvhd", payload(100) { b =>
      b.putInt(0)                     // version 0 + flags
      b.putInt(0); b.putInt(0)        // creation, modification
      b.putInt(timescale)
      b.putInt(durationUnits.toInt)
      b.putInt(0x00010000)            // rate 1.0
      b.putShort(0x0100.toShort)      // volume 1.0
      b.putShort(0); b.putInt(0); b.putInt(0) // reserved
      identityMatrix(b)
      (0 until 6).foreach(_ => b.putInt(0))   // pre_defined
      b.putInt(2)                     // next_track_ID
    })
    val tkhd = box("tkhd", payload(84) { b =>
      b.putInt(7)                     // version 0, flags: enabled|in_movie|in_preview
      b.putInt(0); b.putInt(0)        // creation, modification
      b.putInt(1)                     // track_ID
      b.putInt(0)                     // reserved
      b.putInt(durationUnits.toInt)
      b.putLong(0L)                   // reserved
      b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0) // layer/alt/vol/res
      identityMatrix(b)
      b.putInt(w << 16); b.putInt(h << 16) // 16.16 fixed-point
    })
    val run1 = (nFrames + 1) / 2
    val runs = Seq((run1, 100L), (nFrames - run1, 120L)).filter(_._1 > 0)
    val stts = box("stts", payload(8 + runs.size * 8) { b =>
      b.putInt(0); b.putInt(runs.size)
      runs.foreach { case (c, d) => b.putInt(c.toInt); b.putInt(d.toInt) }
    })
    val stbl = box("stbl", junk(3), stts)
    val mdat = box("mdat",
      Array.tabulate[Byte](48 + (seed & 31))(i => ((seed * 131 + i * 7) & 0xFF).toByte))
    Array.concat(ftyp, junk(1),
      box("moov", junk(2), mvhd, box("trak", tkhd, box("mdia", box("minf", stbl)))),
      mdat)
  }

  /** Video metadata extraction over a media Dataset: one row per decodable
    * MP4 payload with (media_id, timescale, duration_ms, width, height,
    * n_frames) — the video analogue of the q129/q143 paths. Header-only per
    * [[decodeMp4Meta]]; non-MP4 payloads are dropped.
    */
  def videoMeta(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      decodeMp4Meta(r.bytes).map(m =>
        (r.media_id, m.timescale, m.durationMs, m.width.toLong, m.height.toLong, m.nFrames))
    }.toDF("media_id", "timescale", "duration_ms", "width", "height", "n_frames")
  }

  /** Real frame sampling for decodable MP4 payloads: every `everyNthFrame`-th
    * frame index with its presentation time from the stts runs — the frame
    * payloads are never materialized (at scale you never shuffle every frame
    * of every video; downstream decoders seek by pts). Undecodable payloads
    * are dropped; [[sampleFrames]] remains the byte-stub fallback for media
    * without a parseable container.
    */
  def sampleFramesMp4(media: Dataset[MediaRecord], everyNthFrame: Int): DataFrame = {
    require(everyNthFrame > 0, s"everyNthFrame must be positive: $everyNthFrame")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      decodeMp4Meta(r.bytes).toSeq.flatMap { m =>
        (0L until m.nFrames by everyNthFrame.toLong).map(i =>
          (r.media_id, i, m.framePtsMs(i)))
      }
    }.toDF("media_id", "frame_idx", "pts_ms")
  }

  /** Perceptual difference hash (dHash) over the REAL decoded pixels of a
    * PNG/JPEG payload: full ImageIO decode → integer box-average downsample
    * to a 9×8 grayscale grid → 64 bits, bit j = y·8+x set iff the average
    * gray of cell (x+1, y) exceeds cell (x, y) — the standard dHash
    * ("difference hash") construction: robust to re-encode/resize because
    * it keys on the gradient SIGN structure, not pixel values. All-integer
    * arithmetic end to end so every engine computing it agrees bit-for-bit:
    * gray = (299·r + 587·g + 114·b) / 1000 per pixel (truncating), cell
    * comparison by cross-multiplied sums (sumA·nB > sumB·nA — cells of a
    * non-multiple-of-9/8 image differ in pixel count, and integer division
    * first would lose ties).
    *
    * This is the MEDIA analogue of the text sketches (simhash/minhash): a
    * scan-side O(pixels) map per asset producing an 8-byte sketch; the
    * near-dup pair search downstream is [[graft.operators.Dedup
    * .hamming64Pairs]]'s pigeonhole-blocked join — never all-pairs. At
    * 100 TB the full-pixel decode runs once per asset in the prep pass
    * (the [[resize]] economics) and only sketches ever shuffle.
    *
    * Returns None for payloads without a decodable PNG/JPEG container or
    * smaller than the 9×8 grid.
    */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    if (decodeImageDims(bytes).isEmpty) return None
    val img =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val r = cachedReader(if ((bytes(0) & 0xFF) == 0x89) "png" else "jpeg")
        try { r.setInput(iis); r.read(0) }
        finally { r.reset(); iis.close() }
      } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w < 9 || h < 8) return None
    // integer box partition: cell x spans [x·w/9, (x+1)·w/9) — exact
    // averaging when dims are grid multiples, deterministic truncating
    // boxes otherwise
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        sums(cy)(cx) = s
        cnts(cy)(cx) = (x1 - x0).toLong * (y1 - y0)
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (fracGt(sums(cy)(cx + 1), cnts(cy)(cx), sums(cy)(cx), cnts(cy)(cx + 1)))
          bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    Some(bits)
  }

  /** Fixture dHash pattern for doc `id` (gate/test helper — the arithmetic
    * the q199 oracle re-derives in SQL): docs share a 64-bit base pattern
    * per group of 8 (two 32-bit multiply-add halves of id/8, the q24
    * convention that keeps every product < 2⁵³ for engines without wrapping
    * 64-bit multiply), and member m = id%8 flips m%4 bits of it at
    * positions (m·13 + j·17) mod 64 — planting pairs at Hamming 0–3 inside
    * a group (found at maxHamming = 3) and ~32 across groups (not found).
    */
  def dHashPatternOf(id: Long): Long = {
    val g = id / 8; val m = id % 8
    val h1 = (g * 2654435761L + 40503L) % 4294967296L
    val h2 = (g * 2246822519L + 3266489917L) % 4294967296L
    var p = h1 | (h2 << 32)
    var j = 0L
    while (j < m % 4) {
      p ^= 1L << ((m * 13 + j * 17) % 64)
      j += 1
    }
    p
  }

  /** Deterministic PNG whose REAL [[imageDHash]] equals `pattern` (fixture
    * helper, the perceptual twin of [[encodePng]]): a 9×8 grid of
    * `cell`×`cell` blocks whose gray levels walk ±8 from 128 left to right
    * following the pattern's bits, with a zero-sum ±3 dither INSIDE each
    * block (alternating +3/−3, odd pixel left undithered) — so the block
    * averages, and with them the hash, survive only a decoder that
    * actually averages real pixels; a header read or single-pixel sample
    * diverges. Gray range stays in [61, 195] ⊂ [0, 255].
    */
  def encodeDHashPng(pattern: Long, cell: Int): Array[Byte] = {
    require(cell >= 1, s"cell must be >= 1: $cell")
    val img = new java.awt.image.BufferedImage(
      9 * cell, 8 * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      var x = 0
      while (x < 9) {
        // fill block (x, y) with value v plus zero-sum dither
        var i = 0
        val n = cell * cell
        while (i < n) {
          val d = if (i == n - 1 && n % 2 == 1) 0 else if (i % 2 == 0) 3 else -3
          val p = v + d
          img.setRGB(x * cell + i % cell, y * cell + i / cell,
            (p << 16) | (p << 8) | p)
          i += 1
        }
        if (x < 8)
          v += (if ((pattern & (1L << (y * 8 + x))) != 0) 8 else -8)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** PCM16 samples of a WAV payload (channel-interleaved), via the same
    * RIFF chunk walk as [[decodeWavMeta]] — the full-payload read the
    * fingerprint family needs (metadata stays on the header-only path).
    * Returns None unless the payload is parseable 16-bit PCM.
    */
  def wavPcm16Samples(bytes: Array[Byte]): Option[Array[Short]] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
      ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var bitsPerSample = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (bitsPerSample < 0 || dataOff < 0)) {
      val id = tag(off); val size = u32(off + 4)
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length) {
        if (u16(off + 8) != 1) return None // PCM only
        bitsPerSample = u16(off + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.max(0, math.min(size, (bytes.length - off - 8).toLong)).toInt
      }
      // Long-domain step with a hard floor: a malformed/adversarial chunk
      // size near 2^32 would wrap size.toInt negative — off would stall
      // (infinite loop) or go negative (throw) inside an executor task.
      // Any chunk reaching past the payload ends the walk (truncated-file
      // clamping above has already recorded what is recoverable).
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > bytes.length || next <= off) bytes.length else next.toInt
    }
    if (bitsPerSample != 16 || dataOff < 0) None
    else {
      val n = dataLen / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = ((bytes(dataOff + 2 * i) & 0xFF) |
          (bytes(dataOff + 2 * i + 1) << 8)).toShort
        i += 1
      }
      Some(out)
    }
  }

  /** Perceptual AUDIO fingerprint over the REAL decoded PCM samples — the
    * audio twin of [[imageDHash]] (the simplified shape of the
    * chromaprint/shazam family: sign of the energy gradient across time
    * windows): the sample stream is partitioned into 65 equal windows,
    * per-window energy = Σ|sample| (all-integer), and bit i = window i+1
    * louder than window i, compared cross-multiplied (energyA·nB >
    * energyB·nA — windows of a non-multiple length differ by one frame,
    * and dividing first would lose ties). Robust to amplitude-preserving
    * re-encodes and to resampling (the gradient SIGN structure survives);
    * an 8-byte sketch per asset, pair search via the same
    * [[graft.operators.Dedup.hamming64Pairs]] pigeonhole join as the
    * image/text sketches. Returns None unless the payload decodes as
    * 16-bit PCM with ≥ 65 samples.
    */
  def audioDHash(bytes: Array[Byte]): Option[Long] =
    wavPcm16Samples(bytes).filter(_.length >= 65).map { pcm =>
      val n = pcm.length
      val e = new Array[Long](65)
      val c = new Array[Long](65)
      var w = 0
      while (w < 65) {
        val i0 = w * n / 65; val i1 = (w + 1) * n / 65
        var s = 0L
        var i = i0
        while (i < i1) { s += math.abs(pcm(i).toLong); i += 1 }
        e(w) = s; c(w) = (i1 - i0).toLong
        w += 1
      }
      var bits = 0L
      w = 0
      while (w < 64) {
        if (fracGt(e(w + 1), c(w), e(w), c(w + 1))) bits |= 1L << w
        w += 1
      }
      bits
    }

  /** Deterministic WAV whose REAL [[audioDHash]] equals `pattern` (fixture
    * helper, the audio twin of [[encodeDHashPng]]): 65 windows of
    * `framesPerWin` mono PCM16 frames whose AMPLITUDE walks ±200 from
    * 16000 following the pattern's bits; samples alternate sign and carry
    * a zero-sum ±1 magnitude dither in pairs (|a+1| + |a−1| = 2a), so the
    * window energies — and with them the hash — survive only a decoder
    * that actually sums real samples. `framesPerWin` must be even for the
    * dither pairs to cancel; amplitudes stay in [3.2k, 28.8k] ⊂ int16.
    * The [[encodeWav]] junk-LIST-chunk trick applies: a fixed-offset
    * reader mis-parses.
    */
  def encodeEnergyWav(pattern: Long, framesPerWin: Int): Array[Byte] = {
    require(framesPerWin >= 2 && framesPerWin % 2 == 0,
      s"framesPerWin must be even and >= 2: $framesPerWin")
    val samples = new Array[Short](65 * framesPerWin)
    var amp = 16000L
    var w = 0
    while (w < 65) {
      var i = 0
      while (i < framesPerWin) {
        val mag = amp + (if (i % 2 == 0) 1 else -1) // zero-sum pair dither
        val sgn = if ((i / 2) % 2 == 0) 1 else -1   // alternate sign
        samples(w * framesPerWin + i) = (sgn * mag).toShort
        i += 1
      }
      if (w < 64)
        amp += (if ((pattern & (1L << w)) != 0) 200 else -200)
      w += 1
    }
    wavFromSamples(8000, samples)
  }

  /** Perceptual VIDEO fingerprint over the REAL parsed frame timing — the
    * video member of the media-sketch triad ([[imageDHash]] pixels,
    * [[audioDHash]] PCM energy, this one presentation cadence): the first
    * 65 frame DURATIONS from the stts time-to-sample runs (expanded via
    * the same run walk as [[Mp4Meta.framePtsUnits]]), bit i = frame i+1
    * presented longer than frame i. Unlike the other two this is
    * O(header) per asset — the mdat payload is never touched — so at
    * 100 TB it runs at METADATA cost, the cheapest possible dedup signal
    * for video (variable-frame-rate cadence is a strong content
    * fingerprint; identical re-containered videos keep it). Returns None
    * unless the payload parses as MP4 with ≥ 65 frames.
    */
  def videoTimingHash(bytes: Array[Byte]): Option[Long] =
    decodeMp4Meta(bytes).filter(_.nFrames >= 65).map { m =>
      val durs = new Array[Long](65)
      var filled = 0
      m.stts.foreach { case (cnt, delta) =>
        var k = 0L
        while (k < cnt && filled < 65) { durs(filled) = delta; filled += 1; k += 1 }
      }
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (durs(i + 1) > durs(i)) bits |= 1L << i
        i += 1
      }
      bits
    }

  /** Deterministic MP4 whose REAL [[videoTimingHash]] equals `pattern`
    * (fixture helper, the video twin of [[encodeDHashPng]]): 65 stts runs
    * of one frame each whose duration walks ±`step` from 5000 timescale
    * units following the pattern's bits (worst-case 64-step drift ±3200
    * stays positive — a negative duration would wrap through the u32 box
    * field and scramble the planted comparisons) — the junk `free` boxes
    * of [[encodeMp4]] still interleave, so only a genuine box walk plus a
    * genuine run expansion reproduces the bits.
    */
  def encodeTimingMp4(pattern: Long, step: Int = 50, seed: Int = 0): Array[Byte] = {
    val durs = new Array[Long](65)
    var d = 5000L
    var i = 0
    while (i < 65) {
      durs(i) = d
      if (i < 64) d += (if ((pattern & (1L << i)) != 0) step else -step)
      i += 1
    }
    encodeMp4WithStts(timescale = 30000, w = 64, h = 48,
      stts = durs.map(x => (1L, x)).toSeq, seed = seed)
  }

  /** [[encodeMp4]] generalized to an explicit stts run list (the fixture
    * surface the timing fingerprint needs; [[encodeMp4]]'s two-run shape
    * delegates here in spirit — kept separate to leave the q145/q146
    * fixtures byte-stable).
    */
  def encodeMp4WithStts(timescale: Int, w: Int, h: Int,
      stts: Seq[(Long, Long)], seed: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val total = 8 + payload.iterator.map(_.length).sum
      val buf = java.nio.ByteBuffer.allocate(total)
      buf.putInt(total).put(typ.getBytes("US-ASCII"))
      payload.foreach(buf.put)
      buf.array()
    }
    def payload(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n); f(b); b.array()
    }
    def junk(salt: Int): Array[Byte] = box("free",
      Array.tabulate[Byte](5 + ((seed + salt) & 7))(i => ((seed + salt * 31 + i) & 0x7F).toByte))
    def identityMatrix(b: java.nio.ByteBuffer): Unit = {
      b.putInt(0x00010000); b.putInt(0); b.putInt(0)
      b.putInt(0); b.putInt(0x00010000); b.putInt(0)
      b.putInt(0); b.putInt(0); b.putInt(0x40000000)
    }
    val durationUnits = stts.iterator.map { case (c, d) => c * d }.sum
    val ftyp = box("ftyp", payload(8) { b =>
      b.put("isom".getBytes("US-ASCII")); b.putInt(512)
    })
    val mvhd = box("mvhd", payload(100) { b =>
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(timescale); b.putInt(durationUnits.toInt)
      b.putInt(0x00010000); b.putShort(0x0100.toShort)
      b.putShort(0); b.putInt(0); b.putInt(0)
      identityMatrix(b)
      (0 until 6).foreach(_ => b.putInt(0))
      b.putInt(2)
    })
    val tkhd = box("tkhd", payload(84) { b =>
      b.putInt(7); b.putInt(0); b.putInt(0)
      b.putInt(1); b.putInt(0)
      b.putInt(durationUnits.toInt)
      b.putLong(0L)
      b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0)
      identityMatrix(b)
      b.putInt(w << 16); b.putInt(h << 16)
    })
    val sttsBox = box("stts", payload(8 + stts.size * 8) { b =>
      b.putInt(0); b.putInt(stts.size)
      stts.foreach { case (c, d) => b.putInt(c.toInt); b.putInt(d.toInt) }
    })
    val stbl = box("stbl", junk(3), sttsBox)
    val mdat = box("mdat",
      Array.tabulate[Byte](48 + (seed & 31))(i => ((seed * 131 + i * 7) & 0xFF).toByte))
    Array.concat(ftyp, junk(1),
      box("moov", junk(2), mvhd, box("trak", tkhd, box("mdia", box("minf", stbl)))),
      mdat)
  }

  /** Mono PCM16 WAV from raw samples, with the junk LIST chunk between
    * `fmt ` and `data` (see [[encodeWav]]'s walk-honesty argument).
    */
  private def wavFromSamples(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val junk = Array.tabulate[Byte](11)(i => ((7 + i) & 0x7F).toByte)
    val junkPadded = junk.length + (junk.length & 1)
    val dataSize = samples.length * 2
    val riffSize = 4 + (8 + 16) + (8 + junkPadded) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2.toShort).putShort(16.toShort)
    buf.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    if ((junk.length & 1) == 1) buf.put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode: REAL dimensions for PNG/JPEG image payloads (via
    * [[decodeImageDims]]), REAL duration for WAV audio payloads (via
    * [[decodeWavMeta]]) and REAL dimensions + duration for MP4 video
    * payloads (via [[decodeMp4Meta]]); otherwise the deterministic stub:
    *   n_bytes   = payload length
    *   head_hash = polynomial rolling hash of the first 16 bytes
    *   width     = 16 * (1 + byte0 % 64), height = 16 * (1 + byte1 % 64)
    *   duration  = n_bytes (ms) for audio/video, 0 for images
    */
  def decodeOne(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length.toLong
    var h = 0L
    var i = 0
    while (i < math.min(16, r.bytes.length)) {
      h = (h * 31 + (r.bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    val mp4 = if (r.kind == "video") decodeMp4Meta(r.bytes) else None
    val real =
      if (r.kind == "image") decodeImageDims(r.bytes)
      else mp4.map(m => (m.width, m.height))
    val wav = if (r.kind == "audio") decodeWavMeta(r.bytes) else None
    val b0 = if (r.bytes.nonEmpty) r.bytes(0) & 0xFF else 0
    val b1 = if (r.bytes.length > 1) r.bytes(1) & 0xFF else 0
    val (w, ht) = real.getOrElse((16 * (1 + b0 % 64), 16 * (1 + b1 % 64)))
    val duration =
      if (r.kind == "image") 0L
      else wav.map(_._4).orElse(mp4.map(_.durationMs)).getOrElse(n)
    MediaFeatures(r.media_id, r.kind, n, h, w, ht, duration)
  }

  /** Feature extraction over partition-sized batches. `partitions` spreads
    * payload bytes evenly (large blobs make row-count-based splits skew).
    */
  def extractFeatures(media: Dataset[MediaRecord], partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.mapPartitions(_.map(decodeOne))
  }

  /** Byte-granularity frame-sampling FALLBACK for video payloads without a
    * parseable container (real MP4s go through [[sampleFramesMp4]]): one row
    * per sampled byte offset; the payload itself stays a slice reference,
    * not a copy — at scale you never materialize every frame of every video
    * in a shuffle.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyNthByte: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .map(r => (r.media_id, r.bytes.length))
      .toDF("media_id", "n_bytes")
      .select(col("media_id"),
        explode(sequence(lit(0L),
          greatest(expr(s"CAST((n_bytes - 1) div $everyNthByte AS BIGINT)"), lit(0L))))
          .as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * everyNthByte)
  }

  /** Image resize. REAL for PNG/JPEG payloads as of round 7: full ImageIO
    * decode → `Graphics2D.drawImage` bilinear scale to w×h → PNG re-encode,
    * all JDK, executor-side, headless. Non-image payloads and undecodable
    * bytes keep the deterministic stub downsample (every
    * ceil(len/target)-th byte — stable, size-bounded). Either way the
    * plumbing is the same: typed map preserving the MediaRecord shape,
    * target dimensions recorded in `meta` so downstream readers needn't
    * decode. Full-pixel decode is intrinsically the expensive multimodal
    * op — at 100 TB this runs exactly once per asset in the prep pass that
    * writes the resized payload back to parquet, never repeatedly in
    * queries (those read the `meta` fast path).
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    val target = math.max(1, w * h / 8) // stub: budget ~1 byte per 8 px
    def stubBytes(b: Array[Byte]): Array[Byte] =
      if (b.length <= target) b
      else {
        val step = math.max(1, (b.length + target - 1) / target)
        b.indices.by(step).map(b).toArray
      }
    def realBytes(b: Array[Byte]): Option[Array[Byte]] =
      if (decodeImageDims(b).isEmpty) None
      else try {
        // full-pixel decode through the per-thread cached reader (the
        // ImageIO.read convenience re-walks the SPI registry per call)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        val r = cachedReader(if ((b(0) & 0xFF) == 0x89) "png" else "jpeg")
        val src =
          try { r.setInput(iis); r.read(0) }
          finally { r.reset(); iis.close() }
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          Some(writePng(dst))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    media.map(r =>
      if (r.kind != "image") r
      else r.copy(bytes = realBytes(r.bytes).getOrElse(stubBytes(r.bytes)),
        meta = r.meta ++ Seq("resized_w" -> w.toString, "resized_h" -> h.toString)))
  }

  /** Metadata-only projection — must prune the bytes column at scan time
    * (check `.explain`: ReadSchema excludes `bytes`).
    */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), col("meta"))
}
