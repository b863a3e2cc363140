package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = {
    val rng = new scala.util.Random(3)
    val rows = (0L until 50L).map { i =>
      val bytes = Array.fill(64 + rng.nextInt(512))(rng.nextInt.toByte)
      Row(i, bytes, Row("image/png", 64, 48, 0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.mediaSchema).cache()
  }

  test("decode stub produces deterministic embeddings with the right shape") {
    val e1 = Multimodal.decodeToEmbedding(media, dim = 16)
    assert(e1.schema("embedding").dataType.typeName == "array")
    val a = e1.orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(a.forall(_.size == 16))
    val b = Multimodal.decodeToEmbedding(media.repartition(7), dim = 16)
      .orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(a.toSeq == b.toSeq) // partitioning-independent
  }

  test("extract emits thumbnail and frame samples") {
    val x = Multimodal.extract(media, thumbW = 4, thumbH = 4, nFrames = 3)
      .select("thumbnail", "frames").collect()
    assert(x.forall(_.getAs[Array[Byte]](0).length == 16))
    assert(x.forall(_.getSeq[Array[Byte]](1).size == 3))
  }

  /** Build a real binary PGM (P5) gradient image. */
  private def pgm(w: Int, h: Int): Array[Byte] = {
    val hd = s"P5\n# test comment\n$w $h\n255\n".getBytes("US-ASCII")
    hd ++ Array.tabulate(w * h)(i => ((i % w) * 255 / math.max(1, w - 1)).toByte)
  }

  /** Build a real 16-bit mono PCM WAV with a sine burst in the second half. */
  private def wav(n: Int): Array[Byte] = {
    val samples = Array.tabulate(n)(i =>
      if (i < n / 2) 0.0 else 0.5 * math.sin(2 * math.Pi * i / 32.0))
    val out = new java.io.ByteArrayOutputStream()
    def p32(v: Int) = (0 until 4).foreach(k => out.write((v >> (8 * k)) & 0xFF))
    def p16(v: Int) = (0 until 2).foreach(k => out.write((v >> (8 * k)) & 0xFF))
    out.write("RIFF".getBytes); p32(36 + 2 * n); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); p32(16); p16(1); p16(1); p32(8000); p32(16000); p16(2); p16(16)
    out.write("data".getBytes); p32(2 * n)
    samples.foreach(s => p16(math.round(s * 32767).toInt & 0xFFFF))
    out.toByteArray
  }

  test("real PNM codec decodes actual pixels through the batched Spark seam") {
    val img = pgm(16, 8)
    val rows = (0L until 20L).map(i => Row(i, img, Row("image/x-portable-graymap", 16, 8, 0L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), Multimodal.mediaSchema)
    val got = Multimodal.decodeToEmbedding(df, dim = 8, codec = Multimodal.PnmCodec)
      .orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    val direct = Multimodal.PnmCodec.decodeFeatures(img, 8).toSeq
    assert(got.forall(_ == direct), "Spark-side decode differs from direct codec call")
    // a uniform gradient: every luminance bin equally occupied
    assert(direct.forall(v => math.abs(v - 0.125) < 1e-6), direct.toString)
    // resize via the extract path produces a parseable PGM of the right size
    val x = Multimodal.extract(df, thumbW = 4, thumbH = 4, nFrames = 2, codec = Multimodal.PnmCodec)
      .select("thumbnail", "frames").collect()
    assert(x.forall { r =>
      val t = r.getAs[Array[Byte]](0)
      new String(t.take(2)) == "P5" && t.length > 11 && r.getSeq[Array[Byte]](1).size == 2
    })
    // corrupt bytes: zero features, empty thumbnail — never a throw
    val bad = Row(99L, "not an image".getBytes, Row("image/x-portable-graymap", 0, 0, 0L))
    val badDf = spark.createDataFrame(spark.sparkContext.parallelize(Seq(bad), 1), Multimodal.mediaSchema)
    val be = Multimodal.decodeToEmbedding(badDf, dim = 8, codec = Multimodal.PnmCodec)
      .select("embedding").collect()(0).getSeq[Float](0)
    assert(be.forall(_ == 0f))
  }

  test("real WAV codec: silence-vs-signal energy profile survives the Spark seam") {
    val audio = wav(256)
    val rows = Seq(Row(0L, audio, Row("audio/wav", 0, 0, 32L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val e = Multimodal.decodeToEmbedding(df, dim = 4, codec = Multimodal.WavCodec)
      .select("embedding").collect()(0).getSeq[Float](0)
    assert(e.size == 4)
    // first half silent, second half energetic
    assert(e(0) < 1e-4 && e(1) < 1e-4, e.toString)
    assert(e(2) > 0.2 && e(3) > 0.2, e.toString)
    assert(e == Multimodal.WavCodec.decodeFeatures(audio, 4).toSeq)
    // frames are themselves decodable WAVs
    val fr = Multimodal.WavCodec.sampleFrames(audio, 2)
    assert(fr.size == 2 && fr.forall(f => Multimodal.WavCodec.decodeFeatures(f, 2).nonEmpty))
    assert(Multimodal.WavCodec.decodeFeatures("garbage".getBytes, 4).forall(_ == 0f))
  }

  /** Encode known gray (r=g=b sRGB) pixels as real format bytes via ImageIO.
    * TYPE_INT_RGB, not TYPE_BYTE_GRAY: a gray raster's linear color space
    * would gamma-lift the values through write/getRGB round trips.
    */
  private def encodeImage(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer in this JDK")
    baos.toByteArray
  }

  test("ImageIoCodec decodes real PNG/GIF/BMP pixels exactly; JPEG approximately") {
    // gradient: every luminance bin equally occupied (PnmCodec's invariant)
    val w = 32; val h = 8
    val px = Array.tabulate(w * h)(i => (i % w) * 255 / (w - 1))
    for (fmt <- Seq("png", "gif", "bmp")) {
      val bytes = encodeImage(px, w, h, fmt)
      val f = Multimodal.ImageIoCodec.decodeFeatures(bytes, 8)
      assert(f.forall(v => math.abs(v - 0.125) < 1e-6), s"$fmt: ${f.toSeq}")
    }
    // JPEG is lossy: a uniform mid-gray image must still decode with all
    // its mass in the right bin (value 128 -> bin 4 of 8)
    val grayJpg = encodeImage(Array.fill(w * h)(128), w, h, "jpg")
    val fj = Multimodal.ImageIoCodec.decodeFeatures(grayJpg, 8)
    assert(fj(4) > 0.99f, fj.toSeq.toString)
    // resize emits a decodable grayscale PNG of the target size whose
    // pixels came from the source (gradient end bins occupied)
    val thumb = Multimodal.ImageIoCodec.resize(encodeImage(px, w, h, "png"), 8, 4)
    assert(thumb.length > 8 && (thumb(1) & 0xFF) == 'P'.toInt)
    val tf = Multimodal.ImageIoCodec.decodeFeatures(thumb, 8)
    assert(tf(0) > 0f && tf(7) > 0f, tf.toSeq.toString)
    // frames: n horizontal bands, each itself decodable
    val frames = Multimodal.ImageIoCodec.sampleFrames(encodeImage(px, w, h, "png"), 4)
    assert(frames.size == 4 &&
      frames.forall(fb => Multimodal.ImageIoCodec.decodeFeatures(fb, 4).sum > 0.99f))
    // corrupt / truncated bytes degrade to zeros / empty — never a throw
    assert(Multimodal.ImageIoCodec.decodeFeatures("not an image".getBytes, 8).forall(_ == 0f))
    val truncated = encodeImage(px, w, h, "png").take(20)
    assert(Multimodal.ImageIoCodec.decodeFeatures(truncated, 8).forall(_ == 0f))
    assert(Multimodal.ImageIoCodec.resize(truncated, 4, 4).isEmpty)
  }

  test("AutoCodec routes each blob by magic bytes through the Spark seam") {
    val w = 16; val h = 8
    val px = Array.tabulate(w * h)(i => (i % w) * 255 / (w - 1))
    val pngBytes = encodeImage(px, w, h, "png")
    val bmpBytes = encodeImage(px, w, h, "bmp")
    val pgmBytes = pgm(16, 8)
    val wavBytes = wav(256)
    val stubBytes = "plain text payload, no magic".getBytes
    val rows = Seq(
      Row(0L, pngBytes, Row("image/png", w, h, 0L)),
      Row(1L, bmpBytes, Row("image/bmp", w, h, 0L)),
      Row(2L, pgmBytes, Row("image/x-portable-graymap", 16, 8, 0L)),
      Row(3L, wavBytes, Row("audio/wav", 0, 0, 32L)),
      Row(4L, stubBytes, Row("text/plain", 0, 0, 0L)),
      Row(5L, null, Row("application/octet-stream", 0, 0, 0L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.decodeToEmbedding(df, dim = 8) // AutoCodec default
      .orderBy("media_id").select("embedding").collect().map(_.getSeq[Float](0))
    assert(got(0) == Multimodal.ImageIoCodec.decodeFeatures(pngBytes, 8).toSeq)
    assert(got(1) == Multimodal.ImageIoCodec.decodeFeatures(bmpBytes, 8).toSeq)
    assert(got(2) == Multimodal.PnmCodec.decodeFeatures(pgmBytes, 8).toSeq)
    assert(got(3) == Multimodal.WavCodec.decodeFeatures(wavBytes, 8).toSeq)
    assert(got(4) == Multimodal.StubCodec.decodeFeatures(stubBytes, 8).toSeq)
    assert(got(5).forall(_ == 0f))
    // PNG and PGM encodings of the SAME pixels agree feature-for-feature
    // (the two real decoders are interchangeable behind the dispatch)
    val pgmSame = "P5\n16 8\n255\n".getBytes("US-ASCII") ++ px.map(_.toByte)
    assert(Multimodal.AutoCodec.decodeFeatures(pngBytes, 8).toSeq ==
      Multimodal.AutoCodec.decodeFeatures(pgmSame, 8).toSeq)
  }

  test("decoded embeddings feed the similarity operators") {
    val e = Multimodal.decodeToEmbedding(media, dim = 16)
    val knn = Similarity.bruteForceKnn(e, e.filter(col("media_id") < 2), "media_id", "embedding", 3)
    assert(knn.count() == 6)
  }

  test("dHash: re-encode-invariant, local-edit-tolerant, null on non-images") {
    val w = 32; val h = 16
    val rng = new scala.util.Random(11)
    val px = Array.fill(w * h)(rng.nextInt(256))
    val asPgm = "P5\n32 16\n255\n".getBytes("US-ASCII") ++ px.map(_.toByte)
    val base = Multimodal.dHash(asPgm)
    assert(base != null)
    // cross-format: the SAME pixels as PNG and BMP hash identically (both
    // luminance paths normalize to 0..255 with the same grid convention)
    for (fmt <- Seq("png", "bmp")) {
      assert(Multimodal.dHash(encodeImage(px, w, h, fmt)) == base, fmt)
    }
    // a resized copy of a SMOOTH image stays within a few bits (the
    // perceptual property; white noise wouldn't — nearest-neighbor sample
    // columns drift by a pixel between scales, which only preserves
    // orderings when neighboring pixels correlate, as real images do)
    val smooth = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      (127 + 120 * math.sin(2 * math.Pi * x / w) * math.cos(math.Pi * y / h)).toInt
    }
    val hs = Multimodal.dHash(encodeImage(smooth, w, h, "png"))
    val resized = Multimodal.ImageIoCodec.resize(encodeImage(smooth, w, h, "png"), 16, 8)
    val hr = Multimodal.dHash(resized)
    assert(hr != null && java.lang.Long.bitCount(hs ^ hr) <= 12,
      s"resize moved ${java.lang.Long.bitCount(hs ^ hr)} bits")
    // a single-pixel edit flips at most 2 bits (only the grid cells whose
    // nearest-neighbor sample hits the edited pixel can change)
    val edited = px.clone(); edited(5 * w + 7) = 255 - edited(5 * w + 7)
    val he = Multimodal.dHash(encodeImage(edited, w, h, "png"))
    assert(java.lang.Long.bitCount(base ^ he) <= 2)
    // an unrelated image differs in many bits
    val other = Array.fill(w * h)(rng.nextInt(256))
    val ho = Multimodal.dHash(encodeImage(other, w, h, "png"))
    assert(java.lang.Long.bitCount(base ^ ho) > 8)
    // non-images -> null (never a fake hash): junk, WAV audio, null, empty
    assert(Multimodal.dHash("definitely not an image".getBytes) == null)
    assert(Multimodal.dHash(wav(64)) == null)
    assert(Multimodal.dHash(null) == null)
    assert(Multimodal.dHash(Array.empty[Byte]) == null)
    // grids wider than 64 bits are refused loudly
    assertThrows[IllegalArgumentException] { Multimodal.dHash(asPgm, gridW = 9, gridH = 8) }
  }

  test("aHash: volume-invariant energy contour; audio near-dup pairs complete by pigeonhole") {
    val rng = new scala.util.Random(31)
    // samples at multiples of 1/64 so a 0.5x "volume change" stays exact
    def wavOf(samples: Array[Double]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def p32(v: Int) = (0 until 4).foreach(k => out.write((v >> (8 * k)) & 0xFF))
      def p16(v: Int) = (0 until 2).foreach(k => out.write((v >> (8 * k)) & 0xFF))
      out.write("RIFF".getBytes); p32(36 + 2 * samples.length); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); p32(16); p16(1); p16(1); p32(8000); p32(16000); p16(2); p16(16)
      out.write("data".getBytes); p32(2 * samples.length)
      samples.foreach(s => p16(math.round(s * 32767).toInt & 0xFFFF))
      out.toByteArray
    }
    val base = Array.fill(128)((rng.nextInt(33) - 16) / 16.0 * 0.9)
    val hb = Multimodal.aHash(wavOf(base))
    assert(hb != null)
    // identical bytes -> identical hash; half volume -> IDENTICAL hash
    // (monotone scaling preserves every energy comparison)
    assert(Multimodal.aHash(wavOf(base)) == hb)
    assert(Multimodal.aHash(wavOf(base.map(_ * 0.5))) == hb)
    // an unrelated signal differs in many bits
    val other = Array.fill(128)((rng.nextInt(33) - 16) / 16.0 * 0.9)
    assert(java.lang.Long.bitCount(hb ^ Multimodal.aHash(wavOf(other))) > 8)
    // non-audio -> null: junk, image bytes, null
    assert(Multimodal.aHash("not audio".getBytes) == null)
    assert(Multimodal.aHash(pgm(8, 4)) == null)
    assert(Multimodal.aHash(null) == null)
    // pairs: every pair within hamming <= bands-1 found; junk skipped
    val rows = (0 until 20).flatMap { i =>
      val s = Array.fill(128)((rng.nextInt(33) - 16) / 16.0 * 0.9)
      val tweaked = s.clone(); tweaked(17) = -s(17) * 0.5 + 0.05
      Seq(Row(i.toLong, wavOf(s)), Row(100L + i, wavOf(tweaked)))
    } :+ Row(999L, "junk".getBytes)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("aid", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("media", org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val got = Multimodal.audioNearDupPairs(df, "aid", "media", bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = rows.collect { case r if r.getLong(0) != 999L =>
      r.getLong(0) -> Multimodal.aHash(r.getAs[Array[Byte]](1)).longValue
    }
    val expected = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 7
    } yield (i1, i2)).toSet
    assert(expected.subsetOf(got), s"missing ${expected -- got}")
    assert(got.forall { case (a, b) => a != 999L && b != 999L })
  }

  test("imageNearDupPairs finds every pair within hamming bands-1; skips junk") {
    val w = 24; val h = 12
    val rng = new scala.util.Random(23)
    // 30 base images; ids 100+i are one-pixel-edited copies (hamming <= 2)
    val bases = (0 until 30).map(i => i.toLong -> Array.fill(w * h)(rng.nextInt(256)))
    val rows = bases.flatMap { case (id, px) =>
      val edited = px.clone(); edited(37) = 255 - edited(37)
      Seq(Row(id, encodeImage(px, w, h, "png")),
          Row(100L + id, encodeImage(edited, w, h, "bmp")))
    } :+ Row(999L, "junk payload, not an image".getBytes) // must be skipped
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("img_id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("media", org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val got = Multimodal.imageNearDupPairs(df, "img_id", "media", bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole completeness: EVERY pair within hamming <= 7 must be found
    val hashes = rows.collect { case r if r.getLong(0) != 999L =>
      r.getLong(0) -> Multimodal.dHash(r.getAs[Array[Byte]](1)).longValue
    }
    val expected = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 7
    } yield (i1, i2)).toSet
    assert(expected.subsetOf(got), s"missing ${expected -- got}")
    // every edited copy is within hamming 2 of its base -> all 30 found
    assert((0 until 30).forall(i => got.contains((i.toLong, 100L + i))), got.toString)
    // junk produced no pairs
    assert(got.forall { case (a, b) => a != 999L && b != 999L })
    // found pairs really share a band (soundness vs the banding rule)
    val hm = hashes.toMap
    assert(got.forall { case (a, b) =>
      (0 until 8).exists(k => ((hm(a) >>> (8 * k)) & 255) == ((hm(b) >>> (8 * k)) & 255))
    })
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming fingerprint dedup matches batch dedup counts; duplicates suppressed") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val docs = Seq(
      (1L, "the quick brown fox", ts(0)),
      (2L, "THE  quick brown fox", ts(1)), // normalized dup of 1
      (3L, "something else entirely", ts(2)),
      (4L, "the quick brown fox", ts(3)), // dup of 1
      (5L, "fourth distinct document", ts(4))
    ).toDF("doc_id", "text", "ts")
    val batchCount = StreamingDedup.dedup(docs).count()
    assert(batchCount == 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    docs.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(docs.schema).parquet(tmp)
    val q = StreamingDedup.dedup(stream).writeStream
      .outputMode("append").format("memory").queryName("sdedup").start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT count(*) FROM sdedup").collect()(0).getLong(0)
    q.stop()
    assert(streamed == batchCount, s"stream $streamed vs batch $batchCount")
  }
}

class StreamingSessionSpec extends SparkSpec {
  import graft.time.{StreamingSession, TranscriptGen}

  test("streaming session aggregation matches batch sessionization counts") {
    val turns = TranscriptGen.generate(spark, 30, 15, 4).toDF().cache()
    // batch reference: PointInTime session ids
    val batch = graft.time.PointInTime.baseFeatures(turns)
      .groupBy("conv_id", "session_id").count()
    val batchSessions = batch.count()
    // streaming query over the same data via an in-memory source
    val schema = turns.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    turns.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(schema).parquet(tmp)
    val agg = StreamingSession.sessionAgg(stream, gap = "30 minutes")
    val q = agg.writeStream.outputMode("complete").format("memory").queryName("sess").start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT count(*) FROM sess").collect()(0).getLong(0)
    q.stop()
    // session_window(gap 30m) closes a session when the NEXT turn starts
    // > 30m later; the batch rule uses strictly-greater too — counts match
    assert(streamed == batchSessions, s"stream $streamed vs batch $batchSessions")
  }
}
