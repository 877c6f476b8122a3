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
