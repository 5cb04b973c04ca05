package graft

import graft.multimodal.{MediaInference, Multimodal, Png}

/** PNG codec + CLIP preprocessing (reference clip.rs:856-891) and the
  * embedImages pipeline with REAL pixel decode against the fake vision
  * session — the S13 stub boundary closed for PNG. */
class PngSpec extends SparkSpec {

  private def gradient(w: Int, h: Int): Png.Image = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      rgb(o) = ((x * 255) / math.max(1, w - 1)).toByte
      rgb(o + 1) = ((y * 255) / math.max(1, h - 1)).toByte
      rgb(o + 2) = ((x + y) % 256).toByte
    }
    Png.Image(w, h, rgb)
  }

  test("rgb round-trip: encode then decode is byte-identical") {
    val img = gradient(17, 9) // odd sizes exercise row boundaries
    val back = Png.decode(Png.encode(img))
    assert(back.width == 17 && back.height == 9)
    assert(back.rgb.sameElements(img.rgb))
  }

  test("decoder reconstructs Sub/Up/Average/Paeth filtered rows") {
    // hand-build a 3x4 RGB PNG using every filter type once
    val rows: Seq[(Int, Array[Byte])] = Seq(
      1 -> Array[Byte](10, 20, 30, 5, 5, 5, 1, 2, 3),     // Sub: deltas vs left
      2 -> Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3),        // Up: deltas vs prev row
      3 -> Array[Byte](4, 4, 4, 6, 6, 6, 8, 8, 8),        // Average
      4 -> Array[Byte](7, 7, 7, 9, 9, 9, 11, 11, 11))     // Paeth
    val raw = rows.flatMap { case (f, d) => f.toByte +: d.toSeq }.toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](256)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    // reuse encode()'s chunk framing by splicing our IDAT into a shell
    val shell = Png.encode(gradient(3, 4))
    // decode via a fully hand-assembled file instead: signature + IHDR + IDAT + IEND
    val out = new java.io.ByteArrayOutputStream()
    out.write(shell, 0, 8) // signature
    def chunk(t: String, d: Array[Byte]): Unit = {
      val len = d.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = t.getBytes("US-ASCII"); out.write(tb)
      out.write(d)
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(d)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = 3; ihdr(7) = 4; ihdr(8) = 8; ihdr(9) = 2 // 3x4, 8-bit RGB
    chunk("IHDR", ihdr); chunk("IDAT", z.toByteArray); chunk("IEND", Array.empty)
    val img = Png.decode(out.toByteArray)
    // row 0 (Sub): left-accumulating deltas
    assert(img.pixel(0, 0) == ((10, 20, 30)))
    assert(img.pixel(1, 0) == ((15, 25, 35)))
    assert(img.pixel(2, 0) == ((16, 27, 38)))
    // row 1 (Up): previous row + delta
    assert(img.pixel(0, 1) == ((11, 21, 31)))
    assert(img.pixel(2, 1) == ((19, 30, 41)))
    // row 2 (Average): raw + ((left + up) >> 1), hand-reconstructed
    assert(img.pixel(0, 2) == ((9, 14, 19)))
    assert(img.pixel(1, 2) == ((19, 26, 34)))
    assert(img.pixel(2, 2) == ((27, 36, 45)))
    // row 3 (Paeth): predictor picks up for px0/px1, left for px2 ch0
    assert(img.pixel(0, 3) == ((16, 21, 26)))
    assert(img.pixel(1, 3) == ((28, 35, 43)))
    assert(img.pixel(2, 3)._1 == 39)
  }

  test("grayscale, palette, and alpha color types expand to RGB") {
    def handPng(colorType: Int, channels: Int, pix: Array[Byte],
                plte: Option[Array[Byte]] = None): Array[Byte] = {
      val w = 2; val h = 2
      val raw = new Array[Byte](h * (1 + w * channels))
      for (y <- 0 until h)
        System.arraycopy(pix, y * w * channels, raw, y * (1 + w * channels) + 1,
          w * channels)
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](256)
      val z = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
      def chunk(t: String, d: Array[Byte]): Unit = {
        val len = d.length
        out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
          (len >>> 8).toByte, len.toByte))
        val tb = t.getBytes("US-ASCII"); out.write(tb); out.write(d)
        val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(d)
        val c = crc.getValue
        out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
          (c >>> 8).toByte, c.toByte))
      }
      val ihdr = new Array[Byte](13)
      ihdr(3) = 2; ihdr(7) = 2; ihdr(8) = 8; ihdr(9) = colorType.toByte
      chunk("IHDR", ihdr)
      plte.foreach(chunk("PLTE", _))
      chunk("IDAT", z.toByteArray); chunk("IEND", Array.empty)
      out.toByteArray
    }
    // gray: value replicates across channels
    val gray = Png.decode(handPng(0, 1, Array[Byte](0, 64, 127.toByte, 255.toByte)))
    assert(gray.pixel(0, 0) == ((0, 0, 0)) && gray.pixel(1, 1) == ((255, 255, 255)))
    assert(gray.pixel(1, 0) == ((64, 64, 64)))
    // palette: indices resolve through PLTE
    val plte = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0)
    val pal = Png.decode(handPng(3, 1, Array[Byte](0, 1, 1, 0), Some(plte)))
    assert(pal.pixel(0, 0) == ((255, 0, 0)) && pal.pixel(1, 0) == ((0, 255, 0)))
    // rgba: alpha dropped
    val rgbaPix = Array[Byte](
      1, 2, 3, 100.toByte, 4, 5, 6, 200.toByte,
      7, 8, 9, 0, 10, 11, 12, 255.toByte)
    val rgba = Png.decode(handPng(6, 4, rgbaPix))
    assert(rgba.pixel(0, 0) == ((1, 2, 3)) && rgba.pixel(1, 1) == ((10, 11, 12)))
    // gray+alpha: gray replicated, alpha dropped
    val ga = Png.decode(handPng(4, 2, Array[Byte](50, 1, 60, 2, 70, 3, 80, 4)))
    assert(ga.pixel(0, 0) == ((50, 50, 50)) && ga.pixel(1, 1) == ((80, 80, 80)))
  }

  test("malformed bytes are rejected loudly") {
    intercept[IllegalArgumentException] { Png.decode("not a png".getBytes) }
    intercept[IllegalArgumentException] { Png.decode(Array.empty[Byte]) }
    val good = Png.encode(gradient(4, 4))
    intercept[IllegalArgumentException] { Png.decode(good.dropRight(30)) }
  }

  test("clip preprocessing: CHW [0,1] tensor, constant image stays constant") {
    val flat = Png.Image(8, 8, Array.fill(3 * 64)(128.toByte))
    val t = Png.clipPreprocess(flat, size = 4)
    assert(t.length == 3 * 4 * 4)
    assert(t.forall(v => math.abs(v - 128f / 255f) < 1e-6))
    // gradient: channel 0 grows along x after resize, crop centers
    val g = Png.clipPreprocess(gradient(16, 8), size = 4) // wide: crop in x
    assert(g.length == 48)
    val ch0row = (0 until 4).map(x => g(0 * 16 + 0 * 4 + x))
    assert(ch0row.sliding(2).forall(p => p(1) >= p(0)), s"not monotone: $ch0row")
    assert(g.forall(v => v >= 0f && v <= 1f))
  }

  test("dHash64: identical images collide, re-encoded resize stays near, inverse flips far") {
    val a = Png.encode(gradient(16, 12))
    val b = Png.encode(gradient(16, 12))
    assert(Png.dHash64(a) == Png.dHash64(b), "same pixels must hash equal")
    // the same gradient at a different resolution: perceptually identical,
    // hash must be within a small Hamming distance (the dedup property)
    val big = Png.encode(gradient(32, 24))
    val dNear = java.lang.Long.bitCount(Png.dHash64(a) ^ Png.dHash64(big))
    assert(dNear <= 8, s"resized gradient drifted $dNear bits")
    // inverted gradient: every left<right comparison flips
    val inv = {
      val img = gradient(16, 12)
      Png.encode(Png.Image(img.width, img.height,
        img.rgb.map(v => (255 - (v & 0xff)).toByte)))
    }
    val dFar = java.lang.Long.bitCount(Png.dHash64(a) ^ Png.dHash64(inv))
    assert(dFar >= 48, s"inverse only $dFar bits away")
  }

  test("embedImages with real PNG decode: decodable rows embed, junk skips") {
    import spark.implicits._
    val pngBytes = Png.encode(gradient(12, 12))
    val rows = Seq(
      Multimodal.MediaRow(1L, "i://a.png", "image", pngBytes, Map.empty),
      Multimodal.MediaRow(2L, "i://junk.jpg", "image", "jfif junk".getBytes, Map.empty),
      Multimodal.MediaRow(3L, "a://x.wav", "audio", Array[Byte](1), Map.empty))
    val out = MediaInference.embedImages(
      spark.createDataset(rows),
      () => new MediaInference.FakeVisionBackend(16),
      preprocess = Png.clipPreprocessor(size = 8)).collect()
    assert(out.map(_.mediaId).toSeq == Seq(1L))
    assert(out.head.feature.length == 16)
  }

  test("embedImages runs the reflective vision session on a decoded PNG") {
    import spark.implicits._
    val pngBytes = Png.encode(gradient(10, 10))
    val rows = Seq(Multimodal.MediaRow(1L, "i://a.png", "image", pngBytes, Map.empty))
    FakeOrt.withLoader {
      val out = MediaInference.embedImages(
        spark.createDataset(rows),
        () => new MediaInference.OnnxVisionBackend("fake-vision-dim6.onnx", 6),
        preprocess = Png.clipPreprocessor(size = 8)).collect()
      assert(out.length == 1 && out.head.feature.length == 6)
      // fake vision model: out[j] = sum(pixels) + j — so the embedding is a
      // pure function of the REAL decoded pixel tensor
      val expectedSum = Png.clipPreprocess(Png.decode(pngBytes), 8).sum
      assert(math.abs(out.head.feature(0) - expectedSum) < 1e-2)
      assert(math.abs(out.head.feature(5) - (expectedSum + 5)) < 1e-2)
    }
  }
}
