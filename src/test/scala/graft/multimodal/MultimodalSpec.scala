package graft.multimodal

import graft.SparkSuite
import graft.multimodal.MultimodalOps._

/** The plumbing the oracle can't check: float feature vectors, batch
  * shape, partitioning behavior, frame-sampling mechanics.
  */
class MultimodalSpec extends SparkSuite {

  private lazy val media = mediaFromDocuments(spark, sf0001)

  test("feature extraction is deterministic and schema-complete") {
    val f1 = extractFeatures(media).collect().sortBy(_.mediaId)
    val f2 = extractFeatures(media).collect().sortBy(_.mediaId)
    assert(f1.length == media.count())
    assert(f1.map(_.contentHash).toSeq == f2.map(_.contentHash).toSeq)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 8)
      assert(f.features.forall(v => v >= 0f && v <= 1f))
      assert(f.width >= 1 && f.width <= 640)
      assert(f.height >= 1 && f.height <= 480)
      assert(f.contentHash.matches("[0-9a-f]{32}"))
    }
  }

  test("feature extraction agrees with the stub decoder row-by-row") {
    val row = media.filter(_.mediaId == 0L).collect().head
    val (w, h, feats) = StubDecoder.decode(row.content)
    val extracted = extractFeatures(media).filter(_.mediaId == 0L)
      .collect().head
    assert(extracted.width == w && extracted.height == h)
    assert(extracted.features.toSeq == feats.toSeq)
  }

  test("extraction is narrow: partition count is preserved (no shuffle)") {
    val repartitioned = media.repartition(7)
    assert(extractFeatures(repartitioned).rdd.getNumPartitions == 7)
  }

  test("resize keeps every 2nd byte, halves dims, stays narrow") {
    val one = media.filter(_.mediaId == 0L)
    val content = one.collect().head.content
    val r = resize(one).collect().head
    val expected = Array.range(0, content.length, 2).map(content)
    assert(r.resizedBytes == (content.length + 1) / 2)
    assert(r.resizedHash == md5Hex(expected))
    val (w, h, _) = StubDecoder.decode(content)
    assert(r.width == math.max(w / 2, 1) && r.height == math.max(h / 2, 1))
    // arbitrary binary (not just ASCII) round-trips deterministically
    import spark.implicits._
    val blob = Array.tabulate(257)(i => (i % 256).toByte)
    val ds = Seq(MediaRecord(99L, "image", blob, "synthetic://x"))
      .toDS()
    val rb = resize(ds).collect().head
    assert(rb.resizedBytes == 129)
    assert(rb.resizedHash ==
      md5Hex(Array.range(0, 257, 2).map(blob)))
    // narrow: partition count preserved
    assert(resize(media.repartition(5)).rdd.getNumPartitions == 5)
  }

  test("P6 codec: encode→decode round-trips real pixels exactly") {
    val bytes = PpmCodec.encode(5, 3, i => (i * 37 + 11) % 256)
    val Some((w, h, px)) = PpmCodec.decode(bytes)
    assert(w == 5 && h == 3 && px.length == 45)
    assert(px.zipWithIndex.forall { case (b, i) =>
      (b & 0xff) == (i * 37 + 11) % 256 })
    // header comments are spec-legal and skipped
    val commented = ("P6\n# a comment\n5 3\n255\n").getBytes("US-ASCII") ++
      px
    val Some((w2, h2, px2)) = PpmCodec.decode(commented)
    assert(w2 == 5 && h2 == 3 && px2.sameElements(px))
  }

  test("P6 codec: malformed bytes parse to None, decodeAny falls back") {
    val good = PpmCodec.encode(4, 4, _ => 7)
    assert(PpmCodec.decode(good).isDefined)
    // wrong magic, truncated raster, bad maxval, plain text
    assert(PpmCodec.decode("P5\n4 4\n255\n".getBytes ++
      new Array[Byte](48)).isEmpty)
    assert(PpmCodec.decode(good.dropRight(1)).isEmpty)
    assert(PpmCodec.decode("P6\n4 4\n127\n".getBytes ++
      new Array[Byte](48)).isEmpty)
    val text = "some document text".getBytes("UTF-8")
    assert(PpmCodec.decode(text).isEmpty)
    // dispatch is TYPE-driven: only declared image/ppm reaches the
    // real codec; any other type takes the stub even if its bytes
    // happen to parse as P6 (legacy fixtures stay byte-for-byte stable)
    val (sw, sh, sf) = StubDecoder.decode(text)
    val (aw, ah, af) = decodeAny("image", text)
    assert(aw == sw && ah == sh && af.sameElements(sf))
    val (gw, gh, gf) = StubDecoder.decode(good)
    val (xw, xh, xf) = decodeAny("image", good) // P6 bytes, non-ppm type
    assert(xw == gw && xh == gh && xf.sameElements(gf))
    val (w, h, f) = decodeAny(PpmMediaType, good)
    assert(w == 4 && h == 4)
    // constant raster 7 ⇒ every channel/quadrant mean is 7/255
    assert(f.forall(v => math.abs(v - 7.0f / 255.0f) < 1e-6))
    // malformed bytes under the ppm type still fall back to the stub
    val (bw, bh, bf) = decodeAny(PpmMediaType, text)
    assert(bw == sw && bh == sh && bf.sameElements(sf))
    // overflow guard: a crafted header whose Int32 3·w·h wraps to a
    // small non-negative count must be rejected, not decoded with
    // inconsistent dims (99999·99999·3 mod 2^32 = 1_410_065_408·…)
    val crafted = "P6\n99999 99999\n255\n".getBytes("US-ASCII") ++
      new Array[Byte](16)
    assert(PpmCodec.decode(crafted).isEmpty)
  }

  test("WAV codec: encode→decode round-trips PCM16 samples exactly") {
    val samples = Array.tabulate(30)(i => ((i * 1103) - 16000).toShort)
    val bytes = WavCodec.encode(2, 16000, samples)
    assert(bytes.length == 44 + 60)
    val Some((nCh, rate, s)) = WavCodec.decode(bytes)
    assert(nCh == 2 && rate == 16000 && s.sameElements(samples))
    // unknown chunks between fmt and data are walked over (RIFF spec),
    // including the word-alignment pad on odd-length chunks
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // len 3 + 1 pad byte
    val withJunk = bytes.take(36) ++ junk ++ bytes.drop(36)
    // fix the RIFF size field for the inserted chunk
    val riffLen = withJunk.length - 8
    withJunk(4) = (riffLen & 0xff).toByte
    withJunk(5) = ((riffLen >> 8) & 0xff).toByte
    val Some((nCh2, _, s2)) = WavCodec.decode(withJunk)
    assert(nCh2 == 2 && s2.sameElements(samples))
  }

  test("WAV codec: malformed bytes parse to None; decodeAny dispatches") {
    val good = WavCodec.encode(1, 8000, Array.tabulate(10)(_.toShort))
    assert(WavCodec.decode(good).isDefined)
    // wrong magic, truncated data, non-PCM format, 8-bit, ragged frames
    assert(WavCodec.decode("RIFX".getBytes ++ good.drop(4)).isEmpty)
    assert(WavCodec.decode(good.dropRight(1)).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float fmt code
    assert(WavCodec.decode(nonPcm).isEmpty)
    val eightBit = good.clone(); eightBit(34) = 8
    assert(WavCodec.decode(eightBit).isEmpty)
    val stereoRagged = good.clone(); stereoRagged(22) = 3 // 10 % 3 != 0
    assert(WavCodec.decode(stereoRagged).isEmpty)
    assert(WavCodec.decode("not audio at all".getBytes("UTF-8")).isEmpty)
    // type-driven dispatch: audio/wav reaches the real codec (frames ×
    // channels as dims); plain "audio" takes the stub even on WAV bytes
    val (fr, ch, _) = decodeAny(WavMediaType, good)
    assert(fr == 10 && ch == 1)
    val (sw, sh, sf) = StubDecoder.decode(good)
    val (aw, ah, af) = decodeAny("audio", good)
    assert(aw == sw && ah == sh && af.sameElements(sf))
  }

  test("PNG codec: encode→decode round-trips every filter type exactly") {
    // all 5 scanline filters, both color types, non-square dims — each
    // combination must unfilter back to the exact generative raster
    for (ft <- 0 to 4; nCh <- Seq(1, 3)) {
      val (w, h) = (7, 4)
      val rule = (i: Int) => (i * 53 + 19 + ft * 7) % 256
      val bytes = PngCodec.encode(w, h, nCh, rule, filterType = ft)
      val Some((dw, dh, dch, px)) = PngCodec.decode(bytes)
      assert(dw == w && dh == h && dch == nCh, s"dims ft=$ft nCh=$nCh")
      assert(px.length == w * h * nCh)
      assert(px.zipWithIndex.forall { case (b, i) =>
        (b & 0xff) == rule(i) }, s"pixels ft=$ft nCh=$nCh")
    }
    // 1×1 edge (no left/up neighbors anywhere)
    val one = PngCodec.encode(1, 1, 3, i => 200 + i, filterType = 4)
    assert(PngCodec.decode(one).get._4.map(_ & 0xff).toSeq ==
      Seq(200, 201, 202))
  }

  test("PNG codec: malformed bytes parse to None; decodeAny dispatches") {
    val good = PngCodec.encode(5, 3, 3, i => (i * 31) % 256, 2)
    assert(PngCodec.decode(good).isDefined)
    // wrong signature
    assert(PngCodec.decode("not a png".getBytes("UTF-8")).isEmpty)
    // flipped bit in IDAT payload → CRC mismatch must reject
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x40).toByte
    assert(PngCodec.decode(corrupt).isEmpty)
    // truncated stream
    assert(PngCodec.decode(good.dropRight(8)).isEmpty)
    // unsupported: 16-bit depth (patch IHDR + fix its CRC)
    val deep = good.clone()
    deep(24) = 16
    val crc = new java.util.zip.CRC32()
    crc.update(deep, 12, 4 + 13)
    val cv = crc.getValue.toInt
    var i = 0
    while (i < 4) { deep(29 + i) = ((cv >>> (24 - 8 * i)) & 0xff).toByte; i += 1 }
    assert(PngCodec.decode(deep).isEmpty)
    // type-driven dispatch: image/png reaches the real codec; a plain
    // "image" type takes the stub even on PNG bytes
    val (w, h, f) = decodeAny(PngMediaType, good)
    assert(w == 5 && h == 3 && f.length == 8)
    val (sw, sh, sf) = StubDecoder.decode(good)
    val (aw, ah, af) = decodeAny("image", good)
    assert(aw == sw && ah == sh && af.sameElements(sf))
    // malformed bytes under the png type fall back to the stub
    val (bw, bh, _) = decodeAny(PngMediaType, "junk".getBytes)
    val (tw, th, _) = StubDecoder.decode("junk".getBytes)
    assert(bw == tw && bh == th)
  }

  test("frame sampling takes every 2nd 16-byte slice, order preserved") {
    val one = media.filter(_.mediaId == 0L)
    val content = one.collect().head.content
    val frames = sampleFrames(one).collect()
      .map(r => (r.getInt(1), r.getInt(2)))
      .sortBy(_._1)
    val expectedCount = (content.grouped(16).size + 1) / 2
    assert(frames.length == expectedCount)
    assert(frames.map(_._1).toSeq ==
      (0 until content.grouped(16).size by 2).toSeq)
    assert(frames.init.forall(_._2 == 16)) // all but possibly the tail
  }
}
