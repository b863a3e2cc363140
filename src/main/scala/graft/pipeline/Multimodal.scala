package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction /
  * resize / frame-sampling run as batched per-partition transforms.
  *
  * The actual codec calls are STUBBED (this container ships no image/audio
  * libraries): [[StubCodec]] derives a deterministic fake feature vector /
  * thumbnail from the bytes. Everything around the stub — schema, batch
  * iteration, partitioning, output shapes — is real, so swapping in a JNI
  * or Python-worker codec (mapInPandas-style batching) changes one object.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )))
  ))

  /** Codec seam: every per-media operation the plumbing needs. Implemented
    * by [[StubCodec]] (deterministic fake — the default in this codec-less
    * container) and by the REAL pure-JVM decoders [[PnmCodec]] (binary
    * PGM/PPM images) and [[WavCodec]] (RIFF/WAVE 16-bit PCM audio), which
    * prove the batched mapPartitions seam against genuine bytes. A JNI or
    * Python-worker codec plugs in the same way. Implementations must be
    * serializable (shipped inside task closures) and total: undecodable
    * bytes yield the zero vector / empty output, never a throw (one corrupt
    * blob must not kill a 10^12-row job).
    */
  trait MediaCodec extends Serializable {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]

    /** Decoded luminance grid as (row-major 0..255 ints, width, height), or
      * null when the payload isn't a decodable image — the spatial view
      * [[Multimodal.dHash]] needs (histogram features deliberately discard
      * pixel POSITIONS, which a perceptual hash is all about).
      */
    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int)
  }

  /** Deterministic stand-in for a real decoder: features are a seeded hash
    * expansion of the payload; "resize" rescales the fake thumbnail grid;
    * "frame sample" slices the payload into n pseudo-frames.
    */
  object StubCodec extends MediaCodec {
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return Array.fill(dim)(0f)
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h.toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) {
        out(i) = if (bytes == null || bytes.isEmpty) 0 else bytes(i % bytes.length)
        i += 1
      }
      out
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) return Seq.fill(n)(Array.empty[Byte])
      val step = math.max(1, bytes.length / n)
      (0 until n).map(i => bytes.slice(i * step, math.min(bytes.length, i * step + step)))
    }

    /** Deterministic fake 8x8 grid from the same hash expansion, so the
      * stub path exercises the dHash plumbing on arbitrary payloads.
      */
    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      if (bytes == null) return null
      val out = new Array[Int](64)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      i = 0
      while (i < 64) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = ((h >>> 16) & 0xFF).toInt
        i += 1
      }
      (out, 8, 8)
    }
  }

  /** Real image decoder: binary PGM (`P5`) / PPM (`P6`) — the classic
    * netpbm formats (magic, whitespace/comment-separated width height
    * maxval header, then raw samples). Pure JVM, no libraries.
    *
    * - `decodeFeatures`: normalized `dim`-bin luminance histogram of the
    *   ACTUAL pixels (PPM luminance = (r+g+b)/3), so equal images give
    *   equal features and brightness shifts move mass across bins.
    * - `resize`: nearest-neighbor resample re-encoded as binary PGM.
    * - `sampleFrames`: `n` horizontal bands, each a standalone PGM.
    * Undecodable bytes -> zeros / empty, per the MediaCodec contract.
    */
  object PnmCodec extends MediaCodec {
    /** (isColor, width, height, maxval, pixelDataOffset), or null. */
    private def header(b: Array[Byte]): Array[Int] = {
      if (b == null || b.length < 10 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return null
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        // skip whitespace and '#' comment lines
        var guard = true
        while (guard && i < b.length) {
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else if (b(i).toChar.isWhitespace) i += 1
          else guard = false
        }
        var x = 0; var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { x = x * 10 + (b(i) - '0'); i += 1; any = true }
        if (!any) return null
        vals(v) = x
        v += 1
      }
      if (i >= b.length || !b(i).toChar.isWhitespace) return null
      i += 1 // single whitespace after maxval, then raw data
      val (w, h, maxv) = (vals(0), vals(1), vals(2))
      val chans = if (b(1) == '6') 3 else 1
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return null
      if (b.length - i < w.toLong * h * chans) return null
      Array(if (chans == 3) 1 else 0, w, h, maxv, i)
    }

    /** Luminance grid (h rows of w ints 0..maxval), or null. */
    private def lum(b: Array[Byte]): (Array[Int], Int, Int, Int) = {
      val hd = header(b)
      if (hd == null) return null
      val Array(color, w, h, maxv, off) = hd
      val out = new Array[Int](w * h)
      var p = 0
      while (p < w * h) {
        if (color == 1) {
          val o = off + 3 * p
          out(p) = ((b(o) & 0xFF) + (b(o + 1) & 0xFF) + (b(o + 2) & 0xFF)) / 3
        } else out(p) = b(off + p) & 0xFF
        p += 1
      }
      (out, w, h, maxv)
    }

    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val d = lum(bytes)
      if (d == null) return new Array[Float](dim)
      val (px, _, _, maxv) = d
      val hist = new Array[Float](dim)
      var i = 0
      while (i < px.length) {
        val bin = math.min(dim - 1, px(i) * dim / (maxv + 1))
        hist(bin) += 1f
        i += 1
      }
      var j = 0
      while (j < dim) { hist(j) /= px.length; j += 1 }
      hist
    }

    private def encodePgm(px: Array[Int], w: Int, h: Int): Array[Byte] = {
      val hd = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](hd.length + px.length)
      System.arraycopy(hd, 0, out, 0, hd.length)
      var i = 0
      while (i < px.length) { out(hd.length + i) = px(i).toByte; i += 1 }
      out
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val d = lum(bytes)
      if (d == null) return Array.empty
      val (px, sw, sh, maxv) = d
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(sh - 1, y * sh / h)
        var x = 0
        while (x < w) {
          val sx = math.min(sw - 1, x * sw / w)
          out(y * w + x) = px(sy * sw + sx) * 255 / maxv
          x += 1
        }
        y += 1
      }
      encodePgm(out, w, h)
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val d = lum(bytes)
      if (d == null) return Seq.empty
      val (px, w, h, maxv) = d
      (0 until n).map { i =>
        val y0 = i * h / n
        val y1 = math.max(y0 + 1, (i + 1) * h / n)
        encodePgm(px.slice(y0 * w, y1 * w).map(_ * 255 / maxv), w, y1 - y0)
      }
    }

    /** Same *255/maxval normalization as [[resize]], so a PGM and its PNG
      * re-encode produce an identical grid (and identical dHash).
      */
    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      val d = lum(bytes)
      if (d == null) return null
      val (px, w, h, maxv) = d
      (px.map(_ * 255 / maxv), w, h)
    }
  }

  /** Real mainstream-image decoder: JPEG / PNG / GIF / BMP via the pure-JDK
    * `javax.imageio` readers (no external jars). Same output semantics as
    * [[PnmCodec]] so the two are interchangeable behind [[AutoCodec]]:
    *
    * - `decodeFeatures`: normalized `dim`-bin luminance histogram of the
    *   decoded pixels (luminance = (r+g+b)/3 of the sRGB value).
    * - `resize`: nearest-neighbor luminance resample, re-encoded as
    *   grayscale PNG (lossless, so a downstream decode sees these pixels).
    * - `sampleFrames`: `n` horizontal luminance bands, each a PNG.
    *
    * Undecodable / truncated / null bytes -> zeros / empty, per the
    * MediaCodec contract (ImageIO throws on corrupt streams; every entry
    * point catches and degrades — one bad blob must not kill the job).
    */
  object ImageIoCodec extends MediaCodec {
    /** Luminance grid (h rows of w ints 0..255), or null. */
    private def lum(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      if (bytes == null || bytes.isEmpty) return null
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return null
        val (w, h) = (img.getWidth, img.getHeight)
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Int](w * h)
        var i = 0
        while (i < out.length) {
          val p = rgb(i)
          out(i) = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
          i += 1
        }
        (out, w, h)
      } catch { case scala.util.control.NonFatal(_) => null }
    }

    private def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
      try {
        // TYPE_INT_RGB with r=g=b, NOT TYPE_BYTE_GRAY: gray rasters carry a
        // linear-gray color space, so a later getRGB would gamma-lift the
        // samples — r=g=b sRGB values round-trip decode-exact instead
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = px(y * w + x) & 0xFF
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        baos.toByteArray
      } catch { case scala.util.control.NonFatal(_) => Array.empty }
    }

    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val d = lum(bytes)
      if (d == null) return new Array[Float](dim)
      val (px, _, _) = d
      val hist = new Array[Float](dim)
      var i = 0
      while (i < px.length) {
        hist(math.min(dim - 1, px(i) * dim / 256)) += 1f
        i += 1
      }
      var j = 0
      while (j < dim) { hist(j) /= px.length; j += 1 }
      hist
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val d = lum(bytes)
      if (d == null) return Array.empty
      val (px, sw, sh) = d
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(sh - 1, y * sh / h)
        var x = 0
        while (x < w) {
          out(y * w + x) = px(sy * sw + math.min(sw - 1, x * sw / w))
          x += 1
        }
        y += 1
      }
      encodePng(out, w, h)
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val d = lum(bytes)
      if (d == null) return Seq.empty
      val (px, w, h) = d
      (0 until n).map { i =>
        val y0 = i * h / n
        val y1 = math.max(y0 + 1, (i + 1) * h / n)
        encodePng(px.slice(y0 * w, y1 * w), w, y1 - y0)
      }
    }

    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int) = lum(bytes)
  }

  /** Real audio decoder: RIFF/WAVE, PCM 16-bit little-endian (format 1).
    * `decodeFeatures` = per-segment RMS energies over `dim` equal time
    * slices of channel-averaged samples (a real, order-sensitive audio
    * descriptor); `resize`/`sampleFrames` re-slice raw sample windows as
    * standalone mono WAVs. Undecodable -> zeros / empty.
    */
  object WavCodec extends MediaCodec {
    private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

    /** (samples channel-averaged, sampleRate), or null. */
    private def pcm(b: Array[Byte]): (Array[Double], Int) = {
      if (b == null || b.length < 44) return null
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
      var off = 12
      var fmtCh = 0; var rate = 0; var bits = 0
      var data: (Int, Int) = null
      while (off + 8 <= b.length && (fmtCh == 0 || data == null)) {
        val id = new String(b, off, 4, "US-ASCII")
        val sz = le32(b, off + 4)
        if (sz < 0 || off + 8 + sz > b.length) return null
        if (id == "fmt ") {
          if (le16(b, off + 8) != 1) return null // PCM only
          fmtCh = le16(b, off + 10)
          rate = le32(b, off + 12)
          bits = le16(b, off + 22)
        } else if (id == "data") data = (off + 8, sz)
        off += 8 + sz + (sz & 1)
      }
      if (fmtCh <= 0 || bits != 16 || data == null) return null
      val (dOff, dSz) = data
      val n = dSz / (2 * fmtCh)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        var s = 0.0
        var c = 0
        while (c < fmtCh) {
          s += le16(b, dOff + 2 * (i * fmtCh + c)).toShort.toDouble
          c += 1
        }
        out(i) = s / fmtCh / 32768.0
        i += 1
      }
      (out, rate)
    }

    private def encodeWav(samples: Array[Double], rate: Int): Array[Byte] = {
      val n = samples.length
      val out = new Array[Byte](44 + 2 * n)
      def put(s: String, o: Int): Unit = { val a = s.getBytes("US-ASCII"); System.arraycopy(a, 0, out, o, a.length) }
      def p32(v: Int, o: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte; out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte }
      def p16(v: Int, o: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
      put("RIFF", 0); p32(36 + 2 * n, 4); put("WAVE", 8)
      put("fmt ", 12); p32(16, 16); p16(1, 20); p16(1, 22); p32(rate, 24)
      p32(rate * 2, 28); p16(2, 32); p16(16, 34)
      put("data", 36); p32(2 * n, 40)
      var i = 0
      while (i < n) {
        p16(math.max(-32768, math.min(32767, math.round(samples(i) * 32767).toInt)), 44 + 2 * i)
        i += 1
      }
      out
    }

    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val r = rmsOrNull(bytes, dim)
      if (r == null) new Array[Float](dim) else r
    }

    /** Per-segment RMS profile, or null when the payload isn't decodable
      * PCM16 WAV — the distinction [[Multimodal.aHash]] needs (a corrupt
      * blob must not share the all-silence fingerprint).
      */
    def rmsOrNull(bytes: Array[Byte], dim: Int): Array[Float] = {
      val d = pcm(bytes)
      if (d == null || d._1.isEmpty) return null
      val (s, _) = d
      val out = new Array[Float](dim)
      var seg = 0
      while (seg < dim) {
        val a = seg * s.length / dim
        val b2 = math.max(a + 1, (seg + 1) * s.length / dim)
        var acc = 0.0
        var i = a
        while (i < b2) { acc += s(i) * s(i); i += 1 }
        out(seg) = math.sqrt(acc / (b2 - a)).toFloat
        seg += 1
      }
      out
    }

    /** "resize" for audio = resample to w*h total samples (grid flattened). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val d = pcm(bytes)
      if (d == null || d._1.isEmpty) return Array.empty
      val (s, rate) = d
      val n = math.max(1, w * h)
      encodeWav(Array.tabulate(n)(i => s(math.min(s.length - 1, i * s.length / n))), rate)
    }

    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val d = pcm(bytes)
      if (d == null || d._1.isEmpty) return Seq.empty
      val (s, rate) = d
      (0 until n).map { i =>
        val a = i * s.length / n
        val b2 = math.max(a + 1, (i + 1) * s.length / n)
        encodeWav(s.slice(a, b2), rate)
      }
    }

    /** Audio has no image luminance. */
    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int) = null
  }

  /** Format-sniffing dispatcher — the default codec: routes each blob by
    * its magic bytes to the real decoder that understands it (JPEG / PNG /
    * GIF / BMP via [[ImageIoCodec]], binary PGM/PPM via [[PnmCodec]],
    * RIFF/WAVE via [[WavCodec]]) and falls back to the deterministic
    * [[StubCodec]] for unrecognized payloads, so a mixed-format 100 TB
    * media column decodes per-row without a caller-side format column.
    */
  object AutoCodec extends MediaCodec {
    private def route(b: Array[Byte]): MediaCodec = {
      if (b == null || b.length < 12) return StubCodec
      def at(i: Int) = b(i) & 0xFF
      if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') ImageIoCodec // PNG
      else if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) ImageIoCodec          // JPEG
      else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') ImageIoCodec // GIF
      else if (at(0) == 'B' && at(1) == 'M') ImageIoCodec                              // BMP
      else if (at(0) == 'P' && (at(1) == '5' || at(1) == '6')) PnmCodec                // PGM/PPM
      else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
               at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') WavCodec
      else StubCodec
    }
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] =
      route(bytes).decodeFeatures(bytes, dim)
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      route(bytes).resize(bytes, w, h)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      route(bytes).sampleFrames(bytes, n)
    def luminance(bytes: Array[Byte]): (Array[Int], Int, Int) = {
      val c = route(bytes)
      // an unrecognized payload is NOT an image: near-dup hashing must skip
      // it rather than hash the stub's fake grid (junk would cluster)
      if (c eq StubCodec) null else c.luminance(bytes)
    }
  }

  /** media frame -> embedding column via batched per-partition decode.
    * Batches amortize (future) codec-worker startup exactly like
    * mapInPandas' Arrow batches would.
    */
  def decodeToEmbedding(df: DataFrame, dim: Int = 16, batchSize: Int = 256,
                        codec: MediaCodec = AutoCodec): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    val outSchema = df.schema.add(StructField("embedding", ArrayType(FloatType)))
    // Dataset.mapPartitions (not df.rdd + createDataFrame): the decode stays
    // a single logical plan node, so caching/AQE/reuse still see one plan
    // instead of an opaque RDD scan stitched onto a fresh root
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // (a worker-process codec would decode the whole batch in one call)
        batch.map { r =>
          val emb = codec.decodeFeatures(r.getAs[Array[Byte]](mediaIdx), dim)
          Row.fromSeq(r.toSeq :+ emb.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** 64-bit perceptual difference hash (dHash) of an image payload: the
    * luminance grid is nearest-neighbor-sampled to `gridH` rows x
    * (`gridW`+1) columns and bit `y*gridW + x` is set iff the sample at
    * (y, x) is strictly darker than its right neighbor — the standard
    * gradient-direction fingerprint (robust to rescaling, re-encoding and
    * global brightness-PRESERVING transforms; a re-encoded or resized copy
    * lands within a few bits of the original). Returns null (boxed) for
    * undecodable / non-image payloads so near-dup hashing skips them.
    *
    * Sampling uses the same `min(src-1, i*src/dst)` nearest-neighbor
    * convention as the codec `resize` implementations, making the hash
    * reproducible from the raw bytes by an external engine (the
    * q_image_neardup oracle recomputes it from md5-built PGMs in SQL).
    */
  def dHash(bytes: Array[Byte], codec: MediaCodec = AutoCodec,
            gridW: Int = 8, gridH: Int = 8): java.lang.Long = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 64, "dHash needs at most 64 bits")
    val d = codec.luminance(bytes)
    if (d == null) return null
    val (px, w, h) = d
    if (w <= 0 || h <= 0) return null
    val cols = gridW + 1
    var hash = 0L
    var y = 0
    while (y < gridH) {
      val sy = math.min(h - 1, y * h / gridH)
      var x = 0
      while (x < gridW) {
        val v0 = px(sy * w + math.min(w - 1, x * w / cols))
        val v1 = px(sy * w + math.min(w - 1, (x + 1) * w / cols))
        if (v0 < v1) hash |= 1L << (y * gridW + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** 64-bit perceptual audio fingerprint (the dHash idea on the time
    * axis): the channel-averaged PCM is summarized as `segments`+1 RMS
    * energies and bit `k` is set iff segment `k` is strictly quieter than
    * segment `k+1` — an energy-CONTOUR fingerprint, invariant to overall
    * volume (any monotone amplitude scaling preserves every comparison)
    * and robust to re-encoding/resampling. Null for anything that isn't
    * decodable PCM16 WAV (junk must not share the all-silence hash).
    */
  def aHash(bytes: Array[Byte], segments: Int = 64): java.lang.Long = {
    require(segments >= 1 && segments <= 64, "aHash needs 1..64 segments")
    val rms = WavCodec.rmsOrNull(bytes, segments + 1)
    if (rms == null) return null
    var hash = 0L
    var k = 0
    while (k < segments) {
      if (rms(k) < rms(k + 1)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Append a nullable `ahash` column via the batched per-partition seam. */
  def withAHash(df: DataFrame, mediaCol: String = "media", batchSize: Int = 256,
                segments: Int = 64): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = df.schema.add(StructField("ahash", LongType, nullable = true))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r => Row.fromSeq(r.toSeq :+ aHash(r.getAs[Array[Byte]](mediaIdx), segments)))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Audio near-duplicate candidate pairs: energy-contour aHash banded
    * into `bands` bit ranges (pigeonhole: hamming ≤ bands-1 always
    * found) — same one-decode-map-stage + one-shuffle +
    * hub-star-capped shape as [[imageNearDupPairs]]. Non-audio payloads
    * are skipped (null hash).
    */
  def audioNearDupPairs(df: DataFrame, idCol: String, mediaCol: String = "media",
                        bands: Int = 8, maxBucketSize: Int = 4096,
                        batchSize: Int = 256): DataFrame = {
    val hashed = withAHash(df.select(col(idCol), col(mediaCol)), mediaCol, batchSize)
      .filter(col("ahash").isNotNull)
    Dedup.bandedSketchPairs(hashed, idCol, col("ahash"), bits = 64, bands = bands,
      maxBucketSize = maxBucketSize)
  }

  /** Append a nullable `dhash` column via the batched per-partition seam
    * (same shape as [[decodeToEmbedding]]; one map stage, no shuffle).
    */
  def withDHash(df: DataFrame, mediaCol: String = "media", batchSize: Int = 256,
                codec: MediaCodec = AutoCodec,
                gridW: Int = 8, gridH: Int = 8): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val outSchema = df.schema.add(StructField("dhash", LongType, nullable = true))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Row.fromSeq(r.toSeq :+ dHash(r.getAs[Array[Byte]](mediaIdx), codec, gridW, gridH))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Image near-duplicate candidate pairs: dHash each payload, then band
    * the 64-bit hash into `bands` contiguous bit ranges — two images within
    * hamming distance `bands - 1` ALWAYS share a band (pigeonhole), the
    * LAION-style perceptual-dedup regime. Undecodable payloads are skipped
    * (null hash), and the banded stage is the shared
    * [[Dedup.bandedSketchPairs]] core: one decode map stage, ONE shuffle
    * (groupBy band bucket), within-bucket explode with the mega-bucket
    * hub-star cap — flat-color corpora (solid thumbnails hash alike) stay
    * linear instead of quadratic in one task. Output (id1, id2) distinct.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, mediaCol: String = "media",
                        codec: MediaCodec = AutoCodec, bands: Int = 8,
                        maxBucketSize: Int = 4096, batchSize: Int = 256): DataFrame = {
    val hashed = withDHash(df.select(col(idCol), col(mediaCol)), mediaCol, batchSize, codec)
      .filter(col("dhash").isNotNull)
    Dedup.bandedSketchPairs(hashed, idCol, col("dhash"), bits = 64, bands = bands,
      maxBucketSize = maxBucketSize)
  }

  /** Thumbnail + n-frame sample in one batched pass. */
  def extract(df: DataFrame, thumbW: Int = 8, thumbH: Int = 8, nFrames: Int = 4,
              batchSize: Int = 256, codec: MediaCodec = AutoCodec): DataFrame = {
    val mediaIdx = df.schema.fieldIndex("media")
    val outSchema = df.schema
      .add(StructField("thumbnail", BinaryType))
      .add(StructField("frames", ArrayType(BinaryType)))
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val b = r.getAs[Array[Byte]](mediaIdx)
          Row.fromSeq(r.toSeq :+ codec.resize(b, thumbW, thumbH) :+ codec.sampleFrames(b, nFrames))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
