package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, processed by
  * partition-batched executors.
  *
  * The decode seam has a REAL half and a stub half: [[PpmCodec]]
  * decodes actual binary-PPM image bytes end-to-end (the one format a
  * bare JVM handles without codec libraries — exercised with real
  * pixels by `multimodal_decode`); formats the container lacks codecs
  * for (JPEG/PNG/PCM/video) cross the same [[decodeAny]] seam via
  * [[StubDecoder]], a deterministic fake clearly marked as the
  * swap-in point. Everything around the seam — the schema contract,
  * the binary column handling, the `mapPartitions` batch shape (the
  * Scala analog of `mapInPandas`: one iterator per partition,
  * vectorizable batches, no per-row task overhead), the partitioning
  * — is the real production plumbing and is tested.
  *
  * Scale notes: media bytes dwarf metadata, so every transform keeps
  * binary opaque until the per-partition decode, projects metadata
  * early, and never shuffles content (feature extraction is
  * narrow — zero shuffle; only the small feature vectors move
  * afterwards).
  */
object MultimodalOps {

  /** One media record: content is opaque bytes; metadata is typed. */
  final case class MediaRecord(
      mediaId: Long,
      mediaType: String, // image | audio | video
      content: Array[Byte],
      sourceUri: String)

  /** Extracted features: fixed-width vector + decode metadata. */
  final case class MediaFeatures(
      mediaId: Long,
      mediaType: String,
      nBytes: Long,
      contentHash: String,
      width: Int,
      height: Int,
      features: Array[Float])

  /** ======= DECODE BOUNDARY =======
    * [[PpmCodec]] is a REAL decoder for the one format a bare JVM can
    * handle without codec libraries — binary PPM (P6): fixed ASCII
    * header, raw interleaved RGB raster. Real media bytes flow through
    * it end-to-end (header parse, comment skipping, strict raster
    * length check), so the decode seam is exercised with actual
    * pixels, not hashes — see `multimodal_decode`, whose oracle
    * recomputes the decoded channel statistics from the fixture's
    * generative definition. Formats the container cannot decode
    * (JPEG/PNG/PCM/video) still fall to [[StubDecoder]]; a deployment
    * swaps in real codecs at the same signature.
    */
  object PpmCodec {

    /** Binary PPM (P6) bytes for a `width`×`height` image whose raster
      * byte `i` is `px(i) & 0xff` — the deterministic fixture encoder.
      */
    def encode(width: Int, height: Int, px: Int => Int): Array[Byte] = {
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      require(width > 0 && height > 0 &&
        3L * width * height <= Int.MaxValue - header.length,
        s"raster ${width}x$height does not fit one array")
      val n = width * height * 3
      val out = new Array[Byte](header.length + n)
      System.arraycopy(header, 0, out, 0, header.length)
      var i = 0
      while (i < n) { out(header.length + i) = (px(i) & 0xff).toByte; i += 1 }
      out
    }

    /** Strict P6 parse: `(width, height, raster)`; None on anything
      * malformed (wrong magic, non-255 maxval, `#` comments allowed in
      * the header per the spec, raster length must match the dims
      * exactly). None — never garbage — is what lets the dispatching
      * decoder fall back to the stub safely.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (bytes.length < 2 || bytes(0) != 'P'.toByte ||
        bytes(1) != '6'.toByte) return None
      var p = 2
      def skipWs(): Unit = {
        var done = false
        while (!done && p < bytes.length) {
          val c = (bytes(p) & 0xff).toChar
          if (c == '#') {
            while (p < bytes.length && bytes(p) != '\n'.toByte) p += 1
          } else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') p += 1
          else done = true
        }
      }
      def int(): Int = { // -1 = parse failure
        skipWs()
        val s = p
        while (p < bytes.length && (bytes(p) & 0xff).toChar.isDigit) p += 1
        if (p == s || p - s > 5) -1
        else new String(bytes, s, p - s, "US-ASCII").toInt
      }
      val w = int(); val h = int(); val mx = int()
      if (w <= 0 || h <= 0 || mx != 255 || p >= bytes.length) return None
      val c = (bytes(p) & 0xff).toChar // exactly ONE whitespace, then raster
      if (c != ' ' && c != '\n' && c != '\r' && c != '\t') return None
      p += 1
      // raster length in LONG: dims parse up to 5 digits each, so the
      // Int product 3·w·h can overflow and alias a crafted header onto
      // a short byte count — reject before the length check
      val nL = 3L * w * h
      if (nL > Int.MaxValue - 64 || bytes.length - p != nL) return None
      val n = nL.toInt
      val raster = java.util.Arrays.copyOfRange(bytes, p, p + n)
      Some((w, h, raster))
    }

    /** Dims + 8 features from REAL pixels: channel means (R, G, B),
      * overall luma, and the four quadrant luma means — the contract
      * shape [[StubDecoder]] fakes, computed from the raster.
      */
    def features(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
      decode(bytes).map { case (w, h, px) =>
        val sums = new Array[Long](3)
        val quad = new Array[Long](4)
        val quadN = new Array[Long](4)
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          sums(i % 3) += v
          val pixel = i / 3
          val q = (if ((pixel % w) * 2 >= w) 1 else 0) +
            (if ((pixel / w) * 2 >= h) 2 else 0)
          quad(q) += v
          quadN(q) += 1
          i += 1
        }
        val n = w.toLong * h // Long product: 5-digit dims overflow Int
        val f = new Array[Float](8)
        var c = 0
        while (c < 3) { f(c) = sums(c) / (255.0f * n); c += 1 }
        f(3) = (sums(0) + sums(1) + sums(2)) / (765.0f * n)
        var q = 0
        while (q < 4) {
          f(4 + q) =
            if (quadN(q) == 0) 0.0f else quad(q) / (255.0f * quadN(q))
          q += 1
        }
        (w, h, f)
      }
  }

  /** The second REAL pure-JVM codec at the decode seam (the
    * [[PpmCodec]] pattern: fixed binary header, raw payload, no codec
    * libraries): canonical 44-byte PCM WAV — RIFF/WAVE container,
    * `fmt ` chunk (PCM, 16-bit only), chunk-walk to `data`, strict
    * length checks, little-endian samples de-interleaved by
    * `i mod nChannels`. Real audio bytes flow through it end-to-end in
    * `multimodal_decode_wav`, whose oracle recomputes every statistic
    * from the fixture's closed-form sample rule and never sees a byte
    * — any drift in header layout, endianness, chunk walking, or
    * interleave order fails the hash.
    */
  object WavCodec {

    private def le16(out: Array[Byte], p: Int, v: Int): Unit = {
      out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], p: Int, v: Int): Unit = {
      le16(out, p, v & 0xffff); le16(out, p + 2, (v >>> 16) & 0xffff)
    }

    /** Canonical-header PCM16 WAV bytes for interleaved `samples`. */
    def encode(nChannels: Int, sampleRate: Int,
        samples: Array[Short]): Array[Byte] = {
      require(nChannels > 0 && sampleRate > 0 &&
        samples.length % nChannels == 0, "malformed WAV fixture request")
      // 2 bytes/sample + 44-byte header must fit an Int (and the RIFF
      // length fields): past this the Int products below overflow and
      // corrupt the container — same guard class as PpmCodec.encode
      require(samples.length <= (Int.MaxValue - 44) / 2,
        s"WAV sample count ${samples.length} exceeds the 32-bit RIFF limit")
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
      le32(out, 4, 36 + dataLen)
      "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
      "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
      le32(out, 16, 16) // PCM fmt chunk size
      le16(out, 20, 1) // audio format: PCM
      le16(out, 22, nChannels)
      le32(out, 24, sampleRate)
      le32(out, 28, sampleRate * nChannels * 2) // byte rate
      le16(out, 32, nChannels * 2) // block align
      le16(out, 34, 16) // bits per sample
      "data".getBytes("US-ASCII").copyToArray(out, 36)
      le32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) {
        le16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1
      }
      out
    }

    private def rd16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], p: Int): Long =
      (rd16(b, p) & 0xffffL) | ((rd16(b, p + 2) & 0xffffL) << 16)
    private def tag(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")

    /** Strict PCM16 parse: `(nChannels, sampleRate, samples)`; None on
      * anything malformed (wrong magic, non-PCM, non-16-bit, chunk
      * overrun, data length not a whole number of frames). Unknown
      * chunks between `fmt ` and `data` are walked over per the RIFF
      * spec (word-aligned).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE") return None
      var p = 12
      var nCh = -1
      var rate = -1
      while (p + 8 <= bytes.length) {
        val id = tag(bytes, p)
        val len = rd32(bytes, p + 4)
        if (len < 0 || p + 8 + len > bytes.length) return None
        if (id == "fmt ") {
          if (len < 16) return None
          if (rd16(bytes, p + 8) != 1) return None // PCM only
          nCh = rd16(bytes, p + 10)
          rate = rd32(bytes, p + 12).toInt
          if (rd16(bytes, p + 22) != 16) return None // 16-bit only
          if (nCh <= 0 || rate <= 0) return None
        } else if (id == "data") {
          if (nCh <= 0) return None // data before fmt
          val n = len.toInt
          if (n % 2 != 0 || (n / 2) % nCh != 0) return None
          val samples = new Array[Short](n / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = rd16(bytes, p + 8 + 2 * i).toShort; i += 1
          }
          return Some((nCh, rate, samples))
        }
        p += 8 + len.toInt + (len.toInt & 1) // RIFF chunks word-align
      }
      None
    }
  }

  /** The third REAL pure-JVM codec at the decode seam — and the first
    * COMPRESSED one: PNG via `java.util.zip` (Deflater/Inflater +
    * CRC32; no codec libraries). Scope: 8-bit greyscale (color type
    * 0) and 8-bit RGB (color type 2), no interlace — the common
    * subset; everything else parses to None and falls back to the
    * stub, like any format outside a deployment's codec set. The
    * decoder walks chunks strictly (signature, per-chunk CRC, IHDR
    * first, IDAT concatenation in order, exact inflated length) and
    * reverses all five scanline filters (None/Sub/Up/Average/Paeth);
    * the encoder can APPLY any fixed filter type, so round-trip
    * properties exercise every unfilter path, not just the one the
    * encoder prefers.
    */
  object PngCodec {
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** PNG bytes for a `width`×`height` raster of `channels` (1 =
      * grey, 3 = RGB) 8-bit samples `px(i)`, every scanline filtered
      * with `filterType` (0-4). One IDAT, default-level deflate.
      */
    def encode(width: Int, height: Int, channels: Int, px: Int => Int,
        filterType: Int = 0): Array[Byte] = {
      require(channels == 1 || channels == 3, s"channels=$channels")
      require(width > 0 && height > 0 &&
        width.toLong * height * channels <= (64L << 20),
        "raster exceeds the fixture bound")
      require(filterType >= 0 && filterType <= 4, s"filter=$filterType")
      val bpr = width * channels
      val raw = new Array[Byte](height * (1 + bpr))
      val prev = new Array[Int](bpr) // previous UNFILTERED row
      val cur = new Array[Int](bpr)
      var i = 0
      var p = 0
      var y = 0
      while (y < height) {
        raw(p) = filterType.toByte; p += 1
        var x = 0
        while (x < bpr) { cur(x) = px(i) & 0xff; i += 1; x += 1 }
        x = 0
        while (x < bpr) {
          val a = if (x >= channels) cur(x - channels) else 0
          val b = prev(x)
          val c = if (x >= channels) prev(x - channels) else 0
          val pred = filterType match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 => paeth(a, b, c)
          }
          raw(p) = ((cur(x) - pred) & 0xff).toByte; p += 1
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, bpr)
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zOut = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) zOut.write(tmp, 0, defl.deflate(tmp))
      defl.end()
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig, 0, Sig.length)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        be32(out, data.length)
        val t = typ.getBytes("US-ASCII")
        out.write(t, 0, 4)
        out.write(data, 0, data.length)
        val crc = new java.util.zip.CRC32()
        crc.update(t); crc.update(data)
        be32(out, crc.getValue.toInt)
      }
      val ihdr = new java.io.ByteArrayOutputStream()
      be32(ihdr, width); be32(ihdr, height)
      ihdr.write(8) // bit depth
      ihdr.write(if (channels == 3) 2 else 0) // color type
      ihdr.write(0); ihdr.write(0); ihdr.write(0) // comp, filter, interlace
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", zOut.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    private def rdBe32(b: Array[Byte], p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

    /** Strict parse: `(width, height, channels, raster)` with the
      * raster unfiltered to plain row-major samples; None on anything
      * outside the supported subset or malformed (bad signature, CRC
      * mismatch, chunk overrun, wrong inflated length, bad filter
      * byte, missing IEND).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (bytes.length < Sig.length + 12 ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOf(bytes, Sig.length), Sig)) return None
      var p = Sig.length
      var w = -1; var h = -1; var channels = -1
      var sawIhdr = false; var sawEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!sawEnd) {
        if (p + 12 > bytes.length) return None
        val len = rdBe32(bytes, p)
        if (len > Int.MaxValue - 12 || p + 12 + len > bytes.length)
          return None
        val n = len.toInt
        val typ = new String(bytes, p + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, p + 4, 4 + n)
        if (crc.getValue != rdBe32(bytes, p + 8 + n)) return None
        typ match {
          case "IHDR" =>
            if (sawIhdr || n != 13) return None
            sawIhdr = true
            val wL = rdBe32(bytes, p + 8)
            val hL = rdBe32(bytes, p + 12)
            val depth = bytes(p + 16) & 0xff
            val ct = bytes(p + 17) & 0xff
            val comp = bytes(p + 18) & 0xff
            val filt = bytes(p + 19) & 0xff
            val inter = bytes(p + 20) & 0xff
            if (wL < 1 || hL < 1 || wL * hL > (64L << 20) ||
              depth != 8 || (ct != 0 && ct != 2) || comp != 0 ||
              filt != 0 || inter != 0) return None
            w = wL.toInt; h = hL.toInt
            channels = if (ct == 2) 3 else 1
          case "IDAT" =>
            if (!sawIhdr) return None
            idat.write(bytes, p + 8, n)
          case "IEND" =>
            if (!sawIhdr || n != 0) return None
            sawEnd = true
          case _ => if (!sawIhdr) return None // ancillary chunks skipped
        }
        p += 12 + n
      }
      val bpr = w * channels
      val expect = h.toLong * (1 + bpr)
      if (expect > Int.MaxValue - 64) return None
      val raw = new Array[Byte](expect.toInt)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !infl.finished()) {
          val k = infl.inflate(raw, got, raw.length - got)
          if (k == 0 && infl.needsInput()) return None // truncated
          got += k
        }
        // must consume the WHOLE stream to exactly the expected length
        if (got != raw.length ||
          infl.inflate(new Array[Byte](1)) != 0) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally infl.end()
      val px = new Array[Byte](h * bpr)
      val prev = new Array[Int](bpr)
      val cur = new Array[Int](bpr)
      var rp = 0
      var y = 0
      while (y < h) {
        val ft = raw(rp) & 0xff; rp += 1
        if (ft > 4) return None
        var x = 0
        while (x < bpr) {
          val v = raw(rp) & 0xff; rp += 1
          val a = if (x >= channels) cur(x - channels) else 0
          val b = prev(x)
          val c = if (x >= channels) prev(x - channels) else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case _ => paeth(a, b, c)
          }
          cur(x) = (v + pred) & 0xff
          px(y * bpr + x) = cur(x).toByte
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, bpr)
        y += 1
      }
      Some((w, h, channels, px))
    }
  }

  /** ======= STUB BOUNDARY =======
    * The stand-in for codecs the container lacks (JPEG/PNG/PCM/video
    * frames): deterministic in the content bytes so tests and oracles
    * are stable. Signature is the contract: bytes in, dims + features
    * out. [[decodeAny]] prefers the real [[PpmCodec]] when the bytes
    * actually parse as P6.
    */
  object StubDecoder {
    def decode(content: Array[Byte]): (Int, Int, Array[Float]) = {
      val d = MessageDigest.getInstance("MD5").digest(content)
      def u(i: Int): Int = d(i) & 0xff
      val width = 1 + (((u(0) << 8) | u(1)) % 640)
      val height = 1 + (((u(2) << 8) | u(3)) % 480)
      val features = Array.tabulate(8)(i => u(i * 2) / 255.0f)
      (width, height, features)
    }
  }

  /** The declared media type of the real-PPM fixtures — the dispatch
    * key [[decodeAny]] routes to [[PpmCodec]].
    */
  val PpmMediaType = "image/ppm"

  /** The declared media type of the real-WAV fixtures — routed to
    * [[WavCodec]] by [[decodeAny]].
    */
  val WavMediaType = "audio/wav"

  /** The declared media type of the real-PNG fixtures — routed to
    * [[PngCodec]] by [[decodeAny]].
    */
  val PngMediaType = "image/png"

  /** PNG dims + 8 features through the real codec, on the
    * [[StubDecoder]] contract shape ([[PpmCodec.features]] for a
    * channel-count-aware raster): per-channel means (greyscale fills
    * all three with the grey mean), overall luma, four quadrant luma
    * means.
    */
  private def pngFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    PngCodec.decode(bytes).map { case (w, h, nCh, px) =>
      val sums = new Array[Long](3)
      val quad = new Array[Long](4)
      val quadN = new Array[Long](4)
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sums(i % nCh) += v
        val pixel = i / nCh
        val q = (if ((pixel % w) * 2 >= w) 1 else 0) +
          (if ((pixel / w) * 2 >= h) 2 else 0)
        quad(q) += v
        quadN(q) += 1
        i += 1
      }
      val n = w.toLong * h
      val f = new Array[Float](8)
      var c = 0
      while (c < 3) {
        f(c) = sums(c min (nCh - 1)) / (255.0f * n)
        c += 1
      }
      f(3) = (sums(0) + sums(1) + sums(2)) / (255.0f * n * nCh)
      var q = 0
      while (q < 4) {
        f(4 + q) =
          if (quadN(q) == 0) 0.0f else quad(q) / (255.0f * quadN(q))
        q += 1
      }
      (w, h, f)
    }

  /** WAV dims + 8 features through the real codec, on the
    * [[StubDecoder]] contract shape: "width" = frames, "height" =
    * channels; features = per-channel normalized means (first two
    * channels), overall loudness (mean |s|/32768), normalized peak,
    * and the four quarter-window loudness means (the audio analog of
    * the PPM quadrant lumas).
    */
  private def wavFeatures(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    WavCodec.decode(bytes).map { case (nCh, _, s) =>
      val n = s.length.max(1)
      val chSum = new Array[Long](2)
      val chN = new Array[Long](2)
      val quart = new Array[Long](4)
      val quartN = new Array[Long](4)
      var peak = 0L
      var absSum = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toLong
        val a = math.abs(v)
        val c = i % nCh
        if (c < 2) { chSum(c) += v; chN(c) += 1 }
        val q = (i * 4L / n).toInt.min(3)
        quart(q) += a; quartN(q) += 1
        if (a > peak) peak = a
        absSum += a
        i += 1
      }
      val f = new Array[Float](8)
      var c = 0
      while (c < 2) {
        f(c) = if (chN(c) == 0) 0.0f
          else chSum(c) / (32768.0f * chN(c))
        c += 1
      }
      f(2) = absSum / (32768.0f * n)
      f(3) = peak / 32768.0f
      var q = 0
      while (q < 4) {
        f(4 + q) =
          if (quartN(q) == 0) 0.0f else quart(q) / (32768.0f * quartN(q))
        q += 1
      }
      (s.length / nCh, nCh, f)
    }

  /** The dispatching decoder every consumer calls: TYPE-DRIVEN, not
    * content-sniffing — only records declared `image/ppm` go through
    * the real codec (falling back to the stub if their bytes are
    * malformed); every other type takes [[StubDecoder]] unconditionally,
    * so a legacy fixture whose opaque bytes happen to parse as P6 can
    * never silently diverge from the stub-mirroring oracles. This is
    * the swap-in point for a deployment's codec set: one new `case`
    * per (media type, codec).
    */
  def decodeAny(mediaType: String,
      content: Array[Byte]): (Int, Int, Array[Float]) = mediaType match {
    case PpmMediaType =>
      PpmCodec.features(content).getOrElse(StubDecoder.decode(content))
    case WavMediaType =>
      wavFeatures(content).getOrElse(StubDecoder.decode(content))
    case PngMediaType =>
      pngFeatures(content).getOrElse(StubDecoder.decode(content))
    case _ => StubDecoder.decode(content)
  }

  /** Hex md5 (matches Spark's `md5` function and DuckDB's). */
  def md5Hex(content: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(content)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Partition-batched feature extraction — the mapInPandas shape:
    * the executor walks one iterator per partition and can amortize
    * any per-batch setup (codec init, model load) across the whole
    * partition instead of paying it per row.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/model init — once)
      it.map { m =>
        val (w, h, feats) = decodeAny(m.mediaType, m.content)
        MediaFeatures(m.mediaId, m.mediaType, m.content.length.toLong,
          md5Hex(m.content), w, h, feats)
      }
    }
  }

  /** Deterministic frame sampling for "video" content: every
    * `frameBytes`-sized slice stands in for a decoded frame; `step`
    * picks every step-th frame. Explodes to one row per sampled frame
    * — the real pipeline shape for frame-level dedup/embedding.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 16,
      step: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % step == 0)
        .map { case (frame, idx) =>
          (m.mediaId, idx, frame.length, md5Hex(frame))
        }
    }.toDF("media_id", "frame_index", "frame_bytes", "frame_hash")
  }

  /** Resized media: original dims from decode, downsampled content. */
  final case class MediaResized(
      mediaId: Long,
      mediaType: String,
      origBytes: Long,
      resizedBytes: Long,
      width: Int,
      height: Int,
      resizedHash: String)

  /** Deterministic stub resize: keep every `factor`-th content byte
    * (a real deployment decodes, scales, re-encodes at the
    * [[StubDecoder]] boundary — the contract is the same: binary in,
    * smaller binary + scaled dims out). Same partition-batched narrow
    * shape as [[extractFeatures]]: content never shuffles, per-batch
    * codec setup amortizes across the partition.
    */
  def resize(media: Dataset[MediaRecord],
      factor: Int = 2): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val resized = Array.range(0, m.content.length, factor)
          .map(m.content)
        val (w, h, _) = decodeAny(m.mediaType, m.content)
        MediaResized(m.mediaId, m.mediaType, m.content.length.toLong,
          resized.length.toLong, math.max(w / factor, 1),
          math.max(h / factor, 1), md5Hex(resized))
      }
    }
  }

  /** Synthesize a media table from `documents` (the container has no
    * real media; utf-8 text bytes play the opaque blob — which is
    * exactly how the plumbing should treat real media anyway).
    */
  /** 16-bit perceptual fingerprint from the byte-value histogram:
    * bit b is set iff low-nibble bucket b holds more than a uniform
    * share of the content's bytes. Similar content ⇒ similar byte
    * distribution ⇒ small Hamming distance — the pHash shape over the
    * stub decode (a real deployment fingerprints decoded pixels/PCM
    * the same way: histogram → above-mean bits). Computed where the
    * bytes live; only the 2-byte fingerprint ever shuffles.
    */
  def perceptualHash(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val counts = new Array[Long](16)
      var i = 0
      while (i < m.content.length) {
        counts((m.content(i) & 0xff) % 16) += 1
        i += 1
      }
      val total = m.content.length.toLong
      var ph = 0L
      var b = 0
      while (b < 16) {
        if (counts(b) * 16L > total) ph |= (1L << b)
        b += 1
      }
      (m.mediaId, ph)
    }.toDF("media_id", "phash")
  }

  /** Deterministic REAL-image fixture: one small binary PPM per
    * document — dims `(4 + id%5) × (3 + id%4)`, raster byte
    * `i = (7i + 13·id) mod 256` — encoded by [[PpmCodec.encode]] into
    * actual P6 bytes on the executors. The generative rule is closed
    * form, so a SQL oracle can recompute every decoded statistic
    * without ever seeing the bytes: whatever survives the
    * encode→parse→pixel-walk round trip must equal the rule, or the
    * hash gate fails — that is the real-bytes decode proof.
    */
  def ppmFromDocuments(spark: SparkSession,
      dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val bytes = PpmCodec.encode(w, h, i => ((7L * i + 13L * id) % 256).toInt)
          MediaRecord(id, PpmMediaType, bytes, s"synthetic://ppm/$id")
        }
      }
  }

  /** Decoded-pixel statistics through the REAL codec: parse the P6
    * bytes back and walk the raster — per-channel sums and a
    * brightness ratio, all exact integers until one final IEEE
    * divide. Narrow per-partition work, content never shuffles; only
    * these few longs move.
    */
  def decodeStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, px) = PpmCodec.decode(m.content).getOrElse(
          throw new IllegalStateException(
            s"fixture ${m.mediaId} failed P6 parse"))
        val sums = new Array[Long](3)
        var i = 0
        while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
        (m.mediaId, w.toLong, h.toLong, w.toLong * h,
          sums(0), sums(1), sums(2))
      }
    }.toDF("media_id", "width", "height", "n_pix",
      "sum_r", "sum_g", "sum_b")
  }

  /** Deterministic REAL-audio fixture: one small PCM16 WAV per
    * document — `1 + id%2` channels, rate `8000 + (id%3)·4000`,
    * `20 + id%13` frames, interleaved sample
    * `s(i) = ((31i + 7·id) mod 65536) − 32768` — encoded by
    * [[WavCodec.encode]] into actual RIFF bytes on the executors. The
    * generative rule is closed form, so the SQL oracle recomputes
    * every decoded statistic without seeing a byte (the PPM proof,
    * ported to audio).
    */
  def wavFromDocuments(spark: SparkSession,
      dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val nCh = (1 + id % 2).toInt
          val rate = (8000 + (id % 3) * 4000).toInt
          val n = (20 + id % 13).toInt * nCh
          val samples = Array.tabulate(n)(i =>
            (((31L * i + 7L * id) % 65536L) - 32768L).toShort)
          MediaRecord(id, WavMediaType, WavCodec.encode(nCh, rate, samples),
            s"synthetic://wav/$id")
        }
      }
  }

  /** Decoded-sample statistics through the REAL WAV codec: parse the
    * RIFF bytes back and walk the samples — per-channel sums (first
    * two channels; ch1 is 0 for mono), peak and total |amplitude|,
    * all exact integers. Narrow per-partition work; content never
    * shuffles.
    */
  def decodeWavStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (nCh, rate, s) = WavCodec.decode(m.content).getOrElse(
          throw new IllegalStateException(
            s"fixture ${m.mediaId} failed WAV parse"))
        var sum0 = 0L
        var sum1 = 0L
        var peak = 0L
        var absSum = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          if (i % nCh == 0) sum0 += v else if (i % nCh == 1) sum1 += v
          val a = math.abs(v)
          if (a > peak) peak = a
          absSum += a
          i += 1
        }
        (m.mediaId, nCh.toLong, rate.toLong, (s.length / nCh).toLong,
          sum0, sum1, peak, absSum)
      }
    }.toDF("media_id", "n_channels", "sample_rate", "n_frames",
      "sum_ch0", "sum_ch1", "peak_abs", "sum_abs")
  }

  /** Deterministic REAL-PNG fixture: one small image per document —
    * greyscale for even ids, RGB for odd; dims
    * `(3 + id%5) × (2 + id%4)`; raster byte
    * `i = (11i + 5·id) mod 256` — encoded by [[PngCodec.encode]] into
    * actual deflate-compressed, CRC'd PNG bytes on the executors,
    * cycling the scanline filter type `id mod 5` so every filter path
    * carries real data through the oracle gate. The generative rule
    * is closed form, so the SQL oracle recomputes every decoded
    * statistic without seeing a byte (the PPM/WAV proof, now through
    * a compressed container).
    */
  def pngFromDocuments(spark: SparkSession,
      dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (3 + id % 5).toInt
          val h = (2 + id % 4).toInt
          val nCh = if (id % 2 == 0) 1 else 3
          val bytes = PngCodec.encode(w, h, nCh,
            i => ((11L * i + 5L * id) % 256).toInt,
            filterType = (id % 5).toInt)
          MediaRecord(id, PngMediaType, bytes, s"synthetic://png/$id")
        }
      }
  }

  /** Decoded-pixel statistics through the REAL PNG codec: inflate,
    * CRC-check, unfilter, walk the raster — per-channel sums, exact
    * integers. Narrow per-partition work; content never shuffles.
    */
  def decodePngStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, nCh, px) = PngCodec.decode(m.content).getOrElse(
          throw new IllegalStateException(
            s"fixture ${m.mediaId} failed PNG parse"))
        val sums = new Array[Long](3)
        var i = 0
        while (i < px.length) { sums(i % nCh) += px(i) & 0xff; i += 1 }
        (m.mediaId, w.toLong, h.toLong, nCh.toLong, w.toLong * h,
          sums(0), sums(1), sums(2))
      }
    }.toDF("media_id", "width", "height", "n_channels", "n_pix",
      "sum_ch0", "sum_ch1", "sum_ch2")
  }

  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "utf-8").as("content"),
        concat(lit("synthetic://"), col("source"), lit("/"), col("doc_id"))
          .as("sourceUri"))
      .as[MediaRecord]
  }
}
